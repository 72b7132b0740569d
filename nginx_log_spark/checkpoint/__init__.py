from nginx_log_spark.checkpoint.lineage import (  # noqa: F401
    partition_metrics,
    read_manifest,
    run_resumable,
    with_lineage,
)
