from lynx_spark.streaming.ingest import (  # noqa: F401
    correlate_streams,
    daily_rollup_stream,
    dedup_stream,
    parse_write_stream,
    read_write_stream,
    sliding_rate_stream,
    stream_to_cold_tier,
)
