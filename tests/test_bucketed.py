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


def test_incremental_dedup_index_side_never_shuffles(spark, sf_dir):
    """The incremental-ingest contract: the corpus digest index is
    digest-BUCKETED, so deduping a new batch against it shuffles ONLY the
    batch — the index side of the anti-join has no Exchange. Values match
    the plain (unbucketed) run."""
    from nginx_log_spark.functions import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("digest")
    )
    write_bucketed(hist.distinct(), "t_digest_idx", "digest", n_buckets=8)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        kept = incremental_dedup(batch, spark.table("t_digest_idx"))
        p = plan(kept)
        assert "SortMergeJoin" in p and "LeftAnti" in p
        # the index scan's detail block confirms the bucketing is used ...
        idx_detail = p.split("Scan parquet spark_catalog.default.t_digest_idx")[-1]
        assert "Bucketed: true" in idx_detail.split("\n\n")[0]
        # ... and the index branch of the tree (scan up to its Sort) has no
        # Exchange: only the batch side shuffles
        tree = p.split("\n\n")[0].splitlines()
        (scan_i,) = [i for i, ln in enumerate(tree) if "t_digest_idx" in ln]
        idx_branch = tree[scan_i - 4 : scan_i + 1]  # Sort/HashAgg*2/Filter/Scan
        assert any("Sort" in ln for ln in idx_branch)
        assert not any("Exchange" in ln for ln in idx_branch)
        plain = incremental_dedup(batch, hist).toPandas()
        assert sorted(kept.toPandas().doc_id) == sorted(plain.doc_id)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_digest_idx")
