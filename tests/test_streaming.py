"""Structured Streaming: watermarked hourly agg + foreachBatch fan-out."""

from __future__ import annotations

import pytest
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


def test_stream_sessionize_crosses_batches(spark, tmp_path):
    """Planted sessions that SPAN micro-batch boundaries: the state store
    must carry the open session across triggers, and the monotone fold must
    recover the exact batch sessionization."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nginx_log_spark.streaming import sessionize_fold, stream_sessionize

    M = 60_000_000  # one minute in us
    # user 1: events at 0,10,20 | 70,80 min  -> 2 sessions (gap 50 > 30)
    # user 2: events at 5, 45, 85 min -> 3 sessions? gaps are 40 -> 3 separate
    #         (but 45 lands in batch 2, 85 in batch 3: all open-session carry)
    rows = [
        (1, 1, 0 * M), (2, 1, 10 * M), (3, 1, 20 * M),
        (4, 2, 5 * M), (5, 2, 45 * M), (6, 2, 85 * M),
        (7, 1, 70 * M), (8, 1, 80 * M),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "us"]).sort_values("us")
    src = str(tmp_path / "ev")
    os.makedirs(src)
    now = _time.time()
    # 3 time-range files: [0,20], (20,60], (60,90] minutes
    for i, (a, b) in enumerate([(-1, 20 * M), (20 * M, 60 * M), (60 * M, 90 * M)]):
        part = pdf[(pdf.us > a) & (pdf.us <= b)]
        p = f"{src}/{i:02d}.parquet"
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (now + i, now + i))
    stream = (
        spark.readStream.schema("event_id long, user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_unit")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        sessionize_fold(spark.table("sess_unit"))
        .toPandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        [
            (1, 0 * M, 20 * M, 3),
            (1, 70 * M, 80 * M, 2),
            (2, 5 * M, 5 * M, 1),
            (2, 45 * M, 45 * M, 1),
            (2, 85 * M, 85 * M, 1),
        ],
        columns=["user_id", "start_us", "end_us", "n_events"],
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_stream_sessionize_rejects_out_of_order_batch(spark, tmp_path):
    """A late batch (event time < stored session state) must FAIL the query
    loudly — silent negative gaps would merge/corrupt sessions and break
    the monotone-growth invariant sessionize_fold depends on."""
    import os
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from nginx_log_spark.streaming import stream_sessionize

    M = 60_000_000
    src = str(tmp_path / "ev_dis")
    os.makedirs(src)
    now = _time.time()
    # file 0 carries the LATER events, file 1 the earlier ones -> the
    # second micro-batch arrives behind the stored state
    batches = [
        pd.DataFrame([(3, 1, 50 * M), (4, 1, 55 * M)], columns=["event_id", "user_id", "us"]),
        pd.DataFrame([(1, 1, 0 * M), (2, 1, 5 * M)], columns=["event_id", "user_id", "us"]),
    ]
    for i, part in enumerate(batches):
        p = f"{src}/{i:02d}.parquet"
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (now + i, now + i))
    stream = (
        spark.readStream.schema("event_id long, user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_disorder")
        .option("checkpointLocation", str(tmp_path / "ckpt_dis"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="out-of-order"):
        q.awaitTermination(300)


def test_stream_dedup_first_occurrence_wins(spark, tmp_path):
    """Replayed ids across micro-batches: dropDuplicatesWithinWatermark
    keeps exactly one row per doc_id (state carried across triggers), and
    the output ids equal the batch-distinct set."""
    src = str(tmp_path / "in_dd")
    seq = loggen.sequences_df(spark, 400, partitions=2)
    # replay: the same 400 docs written twice as separate files/batches
    seq.write.mode("overwrite").parquet(src)
    seq.write.mode("append").parquet(src)
    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.streaming import stream_dedup

    stream = read_sequence_stream(spark, src, max_files_per_trigger=2)
    q = (
        stream_dedup(stream)
        .select("doc_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select doc_id from dedup_out").toPandas()
    assert len(got) == got.doc_id.nunique()
    exp = {
        r.doc_id
        for r in parse_sequences(spark.read.parquet(src))
        .filter(F.col("valid")).select("doc_id").distinct().collect()
    }
    assert set(got.doc_id) == exp


def test_stream_incremental_dedup_unbounded_history(spark, tmp_path):
    """Duplicates arriving ARBITRARILY late (way past any watermark) are
    dropped because the history is the on-disk digest index, not streaming
    state: batch 2 replays half of batch 1's texts and adds new ones —
    only the new ones survive; the index ends with one digest per unique
    text; re-running the whole stream into the same sinks converges to
    the same kept set (epoch-keyed overwrite, not append)."""
    from nginx_log_spark.streaming import stream_incremental_dedup

    src = str(tmp_path / "in_incr")
    idx = str(tmp_path / "digest_idx")
    kept_dir = str(tmp_path / "kept")

    def docs(ids, texts):
        return spark.createDataFrame(
            list(zip(ids, texts)), "doc_id long, text string"
        )

    # batch 1: docs 0..19 unique texts; batch 2: 10 dups of batch 1 + 10 new
    b1 = docs(range(20), [f"document body number {i}" for i in range(20)])
    b2 = docs(
        range(100, 120),
        [f"document body number {i}" for i in range(10)]
        + [f"fresh late content {i}" for i in range(10)],
    )
    # one file per batch + maxFilesPerTrigger=1 => two distinct epochs,
    # so the batch-2 duplicates are provably dropped via the INDEX (not
    # intra-batch dedup)
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_incremental_dedup(
            stream, idx, kept_dir, str(tmp_path / ckpt)
        ).start()
        q.awaitTermination(300)

    run("ckpt_incr")
    kept = spark.read.parquet(kept_dir).toPandas()
    # every batch-1 doc kept; batch-2 keeps only the 10 fresh texts
    assert set(kept.doc_id) == set(range(20)) | set(range(110, 120))
    index = spark.read.parquet(idx).toPandas()
    assert len(index) == 30 and index.digest.nunique() == 30
    # full replay into the same sinks converges (no dup rows, same set)
    run("ckpt_incr_replay")
    kept2 = spark.read.parquet(kept_dir).toPandas()
    assert sorted(kept2.doc_id) == sorted(kept.doc_id)
    assert len(spark.read.parquet(idx).toPandas()) == 30
