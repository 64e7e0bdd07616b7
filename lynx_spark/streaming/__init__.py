from lynx_spark.streaming.ingest import (  # noqa: F401
    correlate_streams,
    daily_rollup_stream,
    dedup_stream,
    parse_write_stream,
    read_write_stream,
    sliding_rate_stream,
    stream_to_cold_tier,
)
from lynx_spark.streaming.incremental import (  # noqa: F401
    bloom_dedup_document_stream,
    cluster_document_stream,
    curate_document_stream,
    dedup_document_stream,
    distinct_count_stream,
    drift_monitor_stream,
    embedding_stream_assign,
    near_dup_document_stream,
    numeric_drift_monitor_stream,
    read_document_stream,
    read_embedding_stream,
    diff_store_snapshots,
    read_store_snapshot,
)
