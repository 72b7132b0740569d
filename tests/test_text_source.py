"""Compressed rotated-log sources (parse/text_source.py).

Pins: (1) field-level parity — parsing .gz / .bz2 rotated logs yields
byte-identical parsed rows to the plain-text path (which is driver-green
via log_parse_fields); (2) the codec parallelism contract — a directory
of gz files scans one-partition-per-file, and read_log_lines restores
the parse stage to min_partitions; (3) mixed plain+gz directories read
together. File-codec plumbing is not value-oracle-able through the
driver's parquet views, so parity-vs-plain IS the oracle here.
"""

from __future__ import annotations

import bz2
import gzip
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.datagen.loggen import golden_pandas
from nginx_log_spark.parse import parse_lines, read_log_lines
from nginx_log_spark.parse.text_source import codec_splittable

N_LINES = 1200
N_FILES = 3


@pytest.fixture(scope="module")
def log_dirs(tmp_path_factory) -> dict[str, Path]:
    """The same N_LINES deterministic lines written three ways: plain
    (split over N_FILES rotated files), gz (same split), bz2 (same)."""
    root = tmp_path_factory.mktemp("rotated_logs")
    lines = golden_pandas(N_LINES)["line"].tolist()
    chunks = [lines[i::N_FILES] for i in range(N_FILES)]
    dirs = {}
    for kind in ("plain", "gz", "bz2"):
        d = root / kind
        d.mkdir()
        dirs[kind] = d
        for i, chunk in enumerate(chunks):
            data = ("\n".join(chunk) + "\n").encode()
            if kind == "plain":
                (d / f"access.log.{i}").write_bytes(data)
            elif kind == "gz":
                (d / f"access.log.{i}.gz").write_bytes(gzip.compress(data))
            else:
                (d / f"access.log.{i}.bz2").write_bytes(bz2.compress(data))
    return dirs


def _parsed_sorted(spark, path, **kw):
    df = parse_lines(read_log_lines(spark, str(path), **kw))
    return df.orderBy("line").toPandas().reset_index(drop=True)


def test_gz_parity_with_plain(spark, log_dirs):
    plain = _parsed_sorted(spark, log_dirs["plain"])
    gz = _parsed_sorted(spark, log_dirs["gz"])
    assert plain.equals(gz)
    # sanity: the fixture exercises both accept and reject paths
    assert plain["valid"].sum() > 0
    assert (~plain["valid"]).sum() > 0


def test_bz2_parity_with_plain(spark, log_dirs):
    plain = _parsed_sorted(spark, log_dirs["plain"])
    bz = _parsed_sorted(spark, log_dirs["bz2"])
    assert plain.equals(bz)


def test_gz_scan_is_one_partition_per_file(spark, log_dirs):
    raw = spark.read.text(str(log_dirs["gz"]))
    assert raw.rdd.getNumPartitions() == N_FILES


def test_min_partitions_restores_parse_width(spark, log_dirs):
    widened = read_log_lines(spark, str(log_dirs["gz"]), min_partitions=8)
    assert widened.rdd.getNumPartitions() == 8
    # row-preserving: the repartition loses no lines
    assert widened.count() == N_LINES
    # disabled → pure pass-through scan, still capped at n_files
    passthru = read_log_lines(spark, str(log_dirs["gz"]), min_partitions=0)
    assert passthru.rdd.getNumPartitions() == N_FILES


def test_no_repartition_when_scan_is_wide_enough(spark, log_dirs):
    df = read_log_lines(spark, str(log_dirs["plain"]), min_partitions=1)
    # plain 3-file scan already ≥ 1: plan must contain no Exchange
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()


def test_mixed_plain_and_gz_directory(spark, log_dirs, tmp_path):
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    lines = golden_pandas(N_LINES)["line"].tolist()
    (mixed / "a.log").write_bytes(("\n".join(lines[:600]) + "\n").encode())
    (mixed / "b.log.gz").write_bytes(
        gzip.compress(("\n".join(lines[600:]) + "\n").encode())
    )
    got = parse_lines(read_log_lines(spark, str(mixed)))
    assert got.count() == N_LINES
    plain = _parsed_sorted(spark, log_dirs["plain"])
    assert plain.equals(got.orderBy("line").toPandas().reset_index(drop=True))


def test_codec_splittable():
    assert codec_splittable("x/access.log.3.GZ") is False
    assert codec_splittable("x/a.bz2") is True
    assert codec_splittable("x/access.log.7") is None


def test_cli_reads_gz(log_dirs):
    """The reference UX accepts a rotated gz directly (§2.1 source).

    Subprocess, not in-process: cli.main() owns (and stops) its
    SparkSession, which would kill the shared test session."""
    import subprocess
    import sys

    gz_file = sorted(log_dirs["gz"].iterdir())[0]
    r = subprocess.run(
        [sys.executable, "-m", "nginx_log_spark.cli", str(gz_file),
         "--no-color", "--no-echo", "--top", "5", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd=str(Path(__file__).parent.parent),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # reference-parity header (c tool prints 共计N次访问 / 来访IP统计)
    assert "次访问" in r.stdout and "来访IP统计" in r.stdout
