"""Bucketed (hash-clustered) tables: pre-shuffled storage so repeated
joins and aggregations on the cluster key never exchange the fact table.

The reference is a single-pass CLI and has no storage layout at all
(c/main.c:362-379 reads one file start-to-finish); this module is the
100 TB counterpart of that "read once" property for REPEATED access: a
10^12-row tokenized table bucketed by ``doc_id`` joins against per-doc
enrichments (quality scores, dedup verdicts, routing decisions) with
zero fact-side shuffle, every time, forever. One write-time shuffle is
amortized over every downstream join/agg — on Iceberg the same property
comes from a bucket partition transform; the parquet+catalog form here
is the sandbox-runnable equivalent (SURVEY.md §1.2).

Scale shape: ``write_bucketed`` repartitions by the key into exactly
``n_buckets`` producer tasks so each bucket is ONE file (Spark then
trusts the sortBy order; many-files-per-bucket forfeits it). Readers of
two tables bucketed the same way join with SortMergeJoin and NO Exchange
on either side; groupBy(key) aggregates with no Exchange at all
(asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-clustered into ``n_buckets`` by ``key``.

    The one-time repartition is the LAST shuffle this data ever takes for
    ``key``-wise work; sortBy makes each bucket file merge-join-ready
    without a per-task sort at read time."""
    w = (
        df.repartition(n_buckets, key)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-width bucketed tables on their cluster key.

    With matching bucket counts Catalyst plans SortMergeJoin over the
    existing clustering — no Exchange on either side, so the join cost is
    a streaming merge of co-located files regardless of table size."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
