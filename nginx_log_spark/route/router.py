"""Fan-out routing: status-class x source sinks + rejects sink.

The reference routes each line to exactly two places: the aggregate tables
(accepted) or stderr (rejected, c/main.c:480-483). The north-star widens
that to per-sink tables keyed by (status_class, source). We express the
fan-out as ONE partitioned write — Spark's dynamic partitioning IS the
router; per-sink ``filter().write()`` loops would rescan the input once per
sink.

Per-row invariant (BASELINE.json): the ``tokens`` array rides through
untouched — routed output must equal input tokens exactly.

Also here: salted two-phase aggregation for hot keys. AQE fixes skewed
JOINS, not skewed groupBy — a 20%-hot IP would pin one reducer at 100 TB,
so the salt is ours to add (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_status_class(df: DataFrame, status_col: str = "status") -> DataFrame:
    """'404' -> '4xx'; null (rejects) -> 'reject'."""
    return df.withColumn(
        "status_class",
        F.when(
            F.col(status_col).isNotNull(),
            F.concat(F.substring(F.col(status_col), 1, 1), F.lit("xx")),
        ).otherwise(F.lit("reject")),
    )


def split_rejects(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejects) — the rejects DataFrame carries the original
    tokens verbatim (the stderr-echo analogue, c/main.c:480-483)."""
    accepted = parsed.filter(F.col("valid"))
    rejects = parsed.filter(~F.col("valid")).select("doc_id", "tokens", "n_tok", "source")
    return accepted, rejects


def fan_out_write(
    parsed: DataFrame,
    base_path: str,
    mode: str = "overwrite",
    extra_partition_cols: list[str] | None = None,
) -> dict[str, str]:
    """Route parsed rows to per-sink parquet directories.

    Layout: {base}/routed/status_class=…/source=…/  and  {base}/rejects/.
    One shuffle-free scan each; the partitioned write is the fan-out.
    (With an Iceberg catalog this becomes ``writeTo(...).overwritePartitions()``
    — same plan, transactional sink.)
    """
    accepted, rejects = split_rejects(with_status_class(parsed))
    routed_path = f"{base_path}/routed"
    rejects_path = f"{base_path}/rejects"
    part_cols = ["status_class", "source"] + (extra_partition_cols or [])
    (
        accepted.write.mode(mode)
        .partitionBy(*part_cols)
        .parquet(routed_path)
    )
    rejects.write.mode(mode).parquet(rejects_path)
    return {"routed": routed_path, "rejects": rejects_path}


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 16, cnt_col: str = "cnt"
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) partial -> groupBy(key)
    final. The first shuffle spreads a hot key over ``salt_buckets``
    reducers; the second merges ``salt_buckets`` rows per key (tiny).

    Note: for plain counts Spark's partial aggregation already does
    map-side combine, so the salt only pays off when the DISTINCT count per
    (key) per partition is huge or the aggregate is distinct-based; it's
    provided for those shapes and benchmarked in bench.py.
    """
    salt: Column = (F.rand(seed=42) * salt_buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(key).agg(F.sum("_pc").alias(cnt_col))
