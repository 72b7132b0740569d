"""Structured Streaming surface (SURVEY.md §2.8 — north-star optional).

The reference is one-shot batch (report only after EOF, c/main.c:485), so
there is no stateful semantics to replicate; what a live log pipeline needs
is the same parse -> route -> aggregate with watermarked event-time windows:

- read_sequence_stream: file-source stream of the tokenized table,
- stream_hourly_counts: tumbling window + watermark (late-line tolerant),
- stream_fan_out: foreachBatch routing to the same per-sink layout as batch
  (exactly-once per micro-batch via the idempotent partitioned write).

The parse UDF and report expressions are THE SAME objects as batch — one
code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nginx_log_spark.datagen.loggen import SEQ_SCHEMA
from nginx_log_spark.parse import parse_sequences
from nginx_log_spark.reports.reports import time_local_to_ts


def read_sequence_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_hourly_counts(seq_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-hour hits/bytes — the streaming twin of
    reports.hourly_traffic."""
    parsed = parse_sequences(seq_stream).filter(F.col("valid"))
    with_ts = parsed.withColumn("ts", time_local_to_ts(F.col("time_local")))
    return (
        with_ts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("status"))
        .agg(F.count(F.lit(1)).alias("hits"), F.sum("body_bytes_sent").alias("bytes"))
        .select(F.col("win.start").alias("hour"), "status", "hits", "bytes")
    )


def stream_fan_out(seq_stream: DataFrame, out_base: str, checkpoint_dir: str):
    """foreachBatch routing through the SAME single-scan batch fan-out
    writer, partitioned by epoch with DYNAMIC partition overwrite.

    Exactly-once effect: a micro-batch retried after a partial write (sink
    failure, driver restart between write and checkpoint commit) REPLACES
    its own epoch partitions instead of appending duplicates — the file
    source replays a deterministic batch per epoch, so the rewrite converges.
    Layout: {out}/sink=routed|rejects/status_class=…/source=…/epoch=N/.
    """
    from nginx_log_spark.route import fan_out_write

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        parsed = parse_sequences(batch_df).withColumn("epoch", F.lit(int(epoch_id)))
        fan_out_write(
            parsed, out_base, mode="overwrite",
            extra_partition_cols=["epoch"], dynamic_overwrite=True,
        )

    return (
        seq_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
