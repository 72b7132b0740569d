from nginx_log_spark.route.router import (  # noqa: F401
    fan_out_write,
    salted_count,
    split_rejects,
    with_status_class,
)
