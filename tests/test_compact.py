"""Small-file compaction: rows preserved exactly, cold partitions untouched."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from nginx_log_spark.route import compact_sink, partition_file_stats


def _write_fragmented(spark, base: str) -> None:
    """Two partition dirs: k=hot gets 8 small files, k=cold gets 1."""
    hot = spark.range(0, 4000).withColumn("k", F.lit("hot"))
    cold = spark.range(4000, 4500).withColumn("k", F.lit("cold"))
    hot.repartition(8).write.partitionBy("k").mode("overwrite").parquet(base)
    cold.coalesce(1).write.partitionBy("k").mode("append").parquet(base)


def test_partition_file_stats(spark, tmp_path):
    base = str(tmp_path / "sink")
    _write_fragmented(spark, base)
    stats = partition_file_stats(base)
    assert stats["k=hot"]["files"] == 8
    assert stats["k=cold"]["files"] == 1
    assert stats["k=hot"]["bytes"] > 0


def test_compact_preserves_rows_and_skips_cold(spark, tmp_path):
    base = str(tmp_path / "sink")
    _write_fragmented(spark, base)
    before = sorted(r["id"] for r in spark.read.parquet(base).collect())
    cold_files = sorted(p.name for p in (Path(base) / "k=cold").glob("*.parquet"))

    done = compact_sink(spark, base, target_bytes=1 << 30, min_files=2)

    # only the hot partition was rewritten, into one big file
    assert done == {"k=hot": 1}
    stats = partition_file_stats(base)
    assert stats["k=hot"]["files"] == 1
    # cold partition's file is bit-for-bit the one written originally
    assert sorted(p.name for p in (Path(base) / "k=cold").glob("*.parquet")) == cold_files
    # layout change, not a data change
    after = sorted(r["id"] for r in spark.read.parquet(base).collect())
    assert after == before
    # no tmp dirs left behind
    assert not list(Path(base).glob(".compact_tmp_*"))


def test_compact_target_bytes_splits_output(spark, tmp_path):
    base = str(tmp_path / "sink2")
    spark.range(0, 20000).withColumn("k", F.lit("a")).repartition(10).write.partitionBy(
        "k"
    ).mode("overwrite").parquet(base)
    total = partition_file_stats(base)["k=a"]["bytes"]
    # target ~ half the bytes -> ceil(bytes/target) == 2 output files
    done = compact_sink(spark, base, target_bytes=total // 2 + 1, min_files=2)
    assert done["k=a"] == 2
    assert partition_file_stats(base)["k=a"]["files"] == 2
    assert spark.read.parquet(base).count() == 20000
