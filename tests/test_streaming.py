"""Structured Streaming: watermarked hourly agg + foreachBatch fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_log_spark.datagen import loggen
from nginx_log_spark.streaming import (
    read_sequence_stream,
    stream_fan_out,
    stream_hourly_counts,
)

N = 1500


def _write_input(spark, path):
    loggen.sequences_df(spark, N, partitions=3).write.mode("overwrite").parquet(path)


def test_stream_hourly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_input(spark, src)
    stream = read_sequence_stream(spark, src, max_files_per_trigger=1)
    agg = stream_hourly_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from hourly_out").toPandas()

    # batch twin on the same data
    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.reports.reports import time_local_to_ts

    batch = (
        parse_sequences(spark.read.parquet(src))
        .filter(F.col("valid"))
        .withColumn("ts", time_local_to_ts(F.col("time_local")))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "status")
        .agg(F.count(F.lit(1)).alias("hits"), F.sum("body_bytes_sent").alias("bytes"))
        .toPandas()
    )
    key = lambda d: d.sort_values(["hour", "status"]).reset_index(drop=True)
    got, batch = key(got), key(batch)
    assert len(got) == len(batch)
    assert (got.hits.to_numpy() == batch.hits.to_numpy()).all()
    assert (got.bytes.to_numpy() == batch.bytes.to_numpy()).all()


def test_stream_fan_out_counts(spark, tmp_path):
    src = str(tmp_path / "in2")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, src)
    stream = read_sequence_stream(spark, src, max_files_per_trigger=2)
    q = stream_fan_out(stream, out, ckpt).start()
    q.awaitTermination(300)
    routed = spark.read.parquet(f"{out}/sink=routed")
    rejects = spark.read.parquet(f"{out}/sink=rejects")
    assert routed.count() + rejects.count() == N
    assert routed.select("doc_id").distinct().count() == routed.count()
    # idempotent retry: re-writing one epoch's batch must not duplicate rows
    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.route import fan_out_write

    epoch0 = routed.select("epoch").distinct().orderBy("epoch").first()["epoch"]
    replay_ids = {
        r["doc_id"]
        for r in routed.filter(F.col("epoch") == epoch0).select("doc_id").collect()
    } | {
        r["doc_id"]
        for r in rejects.filter(F.col("epoch") == epoch0).select("doc_id").collect()
    }
    seq = spark.read.parquet(src)
    replay = parse_sequences(seq.filter(F.col("doc_id").isin(list(replay_ids)))).withColumn(
        "epoch", F.lit(int(epoch0))
    )
    fan_out_write(replay, out, mode="overwrite",
                  extra_partition_cols=["epoch"], dynamic_overwrite=True)
    routed2 = spark.read.parquet(f"{out}/sink=routed")
    rejects2 = spark.read.parquet(f"{out}/sink=rejects")
    assert routed2.count() + rejects2.count() == N  # no duplicates after replay
