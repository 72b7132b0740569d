"""Bucketed co-located join: the write-once-shuffle-never-again property
the 100 TB design leans on for repeated doc_id-wise joins.

Plan claims pinned here:
  - joining two same-width bucketed tables on the cluster key plans
    SortMergeJoin with NO Exchange on either side;
  - groupBy(cluster key) over a bucketed table aggregates with NO
    Exchange at all;
  - results are value-identical to the plain (shuffling) join.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.route import bucketed_join, write_bucketed


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "source", "n_chars")
    right = docs.select("doc_id", F.length("text").alias("n_text"))
    write_bucketed(left, "t_docs_meta", "doc_id", n_buckets=8)
    write_bucketed(right, "t_docs_len", "doc_id", n_buckets=8)
    yield "t_docs_meta", "t_docs_len"
    spark.sql("DROP TABLE IF EXISTS t_docs_meta")
    spark.sql("DROP TABLE IF EXISTS t_docs_len")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the co-location (not a broadcast) is what
        # removes the shuffle — the regime of two LARGE tables at 100 TB
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, lt, rt, "doc_id")
        p = plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    p = plan(spark.table(lt).groupBy("doc_id").agg(F.sum("n_chars")))
    assert "Exchange" not in p


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = (
        docs.select("doc_id", "source", "n_chars")
        .join(docs.select("doc_id", F.length("text").alias("n_text")), "doc_id")
    )
    got = sorted(tuple(r) for r in bucketed_join(spark, lt, rt, "doc_id").collect())
    exp = sorted(tuple(r) for r in plain.collect())
    assert got == exp and len(got) > 0


def test_one_file_per_bucket(spark, bucketed_tables):
    # many-files-per-bucket forfeits the sortBy order guarantee; the
    # writer's repartition(n_buckets, key) must keep it 1:1
    lt, _ = bucketed_tables
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    import glob

    files = glob.glob(loc.replace("file:", "") + "/part-*")
    assert len(files) == 8
