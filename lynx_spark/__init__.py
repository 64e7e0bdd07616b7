"""lynx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jdockerty/lynx.

The reference (``/root/reference``, Rust, 1.3 kLoC) is a small in-memory
time-series database: HTTP JSON writes -> WAL -> hierarchical in-memory
buffer (namespace -> table -> daily partition) -> Arrow -> DataFusion SQL.
It implements zero relational operators itself (``src/lynx.rs:141``
delegates wholesale to DataFusion); its own code is the ingestion,
durability, schema-inference and formatting shell.

This package re-creates that shell natively in Python and lets Spark
SQL / Catalyst play the role DataFusion plays — and extends the engine
with the large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns) the reference
lacks, all expressed Spark-first for 100 TB-class deployments.

Layout:
    session.py     tuned SparkSession factory (AQE, Arrow, UTC)
    model.py       WriteRequest / tag-value data model (wal.rs:18-25)
    buffer.py      hierarchical in-memory buffer (buffer.rs)
    wal.py         byte-compatible write-ahead log (wal.rs)
    engine.py      the engine: write path + query path (lynx.rs)
    sqlutil.py     FROM-table extraction (lynx.rs:153-172)
    formatting.py  JSON / ASCII-table sinks (query.rs)
    server.py      HTTP API (main.rs)
    sources/       parquet/json/csv loaders, cold tier
    plans/         analytic query library (the SQL surface, SURVEY §2B)
    operators/     dedup, similarity search, multimodal (extensions)
    functions/     text analysis functions (extensions)
    streaming/     Structured Streaming ingest (optional superset)
"""

__version__ = "0.1.0"
