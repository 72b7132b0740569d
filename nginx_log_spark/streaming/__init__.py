from nginx_log_spark.streaming.stream import (  # noqa: F401
    read_sequence_stream,
    stream_fan_out,
    stream_hourly_counts,
)
