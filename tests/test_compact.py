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


def test_ints_csv_matches_literal_join():
    """_ints_csv must be byte-identical to the checksum content format
    (','.join(str(int(v)))) on every source domain the decoders feed it:
    uint8 rasters (bytes and ndarray), int16 PCM extremes, empty input,
    and the generic fallback dtype."""
    import numpy as np

    from nginx_log_spark.functions.multimodal import _ints_csv

    ref = lambda vs: ",".join(str(int(v)) for v in vs).encode()  # noqa: E731
    byte_vec = bytes(range(256)) * 3
    assert _ints_csv(byte_vec) == ref(byte_vec)
    assert _ints_csv(np.frombuffer(byte_vec, np.uint8)) == ref(byte_vec)
    pcm = np.array([-32768, -1, 0, 1, 32767, 12345, -12345], dtype=np.int16)
    assert _ints_csv(pcm) == ref(pcm)
    assert _ints_csv(b"") == b""
    assert _ints_csv(np.array([], dtype=np.int16)) == b""
    wide = np.array([-70000, 70000, 7], dtype=np.int64)  # fallback path
    assert _ints_csv(wide) == ref(wide)
