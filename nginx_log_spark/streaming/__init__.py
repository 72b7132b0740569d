from nginx_log_spark.streaming.stream import (  # noqa: F401
    read_sequence_stream,
    sessionize_fold,
    stream_dedup,
    stream_fan_out,
    stream_incremental_dedup,
    stream_hourly_counts,
    stream_sessionize,
)
