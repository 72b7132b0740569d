"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the config is written for a 1000-executor
cluster (AQE, skew-join handling, pruned scans) and degrades gracefully to
``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "nginx_log_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Parameters are env-overridable so bench.py can run the identical job at
    two parallelism levels (``SPARK_GRAFT_CPUS``) for the scaling-efficiency
    evidence required by BASELINE.md.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # local[N] → one JVM; match shuffle width to cores. On a real cluster this
    # would be ~2-3x total cores and AQE coalesces the rest.
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(n, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # long-lived local sessions: keep the status stores small and GC
        # broadcast/shuffle state periodically (they otherwise accumulate
        # across the many short jobs a report/bench run issues)
        .config("spark.sql.ui.retainedExecutions", "10")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # v2 output committer: task-side renames instead of a sequential
        # driver-side rename of every file at job commit — a partitioned
        # fan-out write produces hundreds of sink files, and v1 serialized
        # their commit on the driver (guide: commit protocol shows up as
        # driver-side dead time at the end of a write). Local/HDFS-class
        # filesystems only; an object-store deployment would use a
        # manifest committer instead.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """One tiny untimed job per fresh session: steady-state protocol.

    A local JVM's FIRST job pays executor/task-scheduler spin-up, Janino
    codegen-compiler init, exchange + broadcast machinery and the parquet
    reader stack — measured ~2.5-4 s charged to whichever query happens
    to run first (BENCH.md's steady-state protocol already warms the
    parse and enrich groups explicitly; this covers every other entry
    point, e.g. the ops group and the correctness sweep children). The
    job below touches exactly those paths on a few thousand in-memory
    rows + a 2-row parquet round-trip (~1 s, amortizes to nothing at any
    real scale). Opt out with SPARK_GRAFT_SESSION_WARMUP=0.
    """
    if os.environ.get("SPARK_GRAFT_SESSION_WARMUP", "1") == "0":
        return
    if spark.conf.get("spark.nginx_log_spark.warmed", None) == "1":
        return
    try:
        import tempfile

        from pyspark.sql import Window, functions as F

        df = spark.range(0, 4096, 1, 8).select(
            (F.col("id") % 97).alias("k"), F.col("id").cast("double").alias("v")
        )
        small = spark.range(0, 97).select(F.col("id").alias("k"))
        w = Window.partitionBy("k").orderBy("v")
        (
            df.join(F.broadcast(small), "k")
            .withColumn("r", F.row_number().over(w))
            .groupBy("k")
            .agg(F.sum("v"), F.count(F.lit(1)))
            .orderBy("k")
            .limit(5)
            .collect()
        )
        with tempfile.TemporaryDirectory(prefix="nls_warm_") as d:
            p = f"{d}/warm.parquet"
            spark.range(0, 2).selectExpr(
                "id", "cast(id as string) s", "cast(id as decimal(18,2)) d"
            ).write.mode("overwrite").parquet(p)
            spark.read.parquet(p).groupBy("s").agg(F.sum("d")).collect()

        # fork the python worker pool (mapInArrow/pandas paths would
        # otherwise pay it on their first timed use)
        def _identity(batches):
            yield from batches

        spark.range(0, 64, 1, 4).mapInArrow(_identity, "id long").count()
    except Exception:  # never let the warm-up break a session
        pass
    finally:
        spark.conf.set("spark.nginx_log_spark.warmed", "1")
