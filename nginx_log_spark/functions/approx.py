"""Mergeable-sketch aggregates: the sublinear-memory path for distinct
counts and quantiles at 10^12-row scale.

The reference holds EXACT per-key hash tables in one process's RAM
(c/main.c:200-260's open-addressed tables) — fine at 2M lines, impossible
at 100 TB for high-cardinality keys (distinct IPs, request paths). The
sketch forms here cost O(kB) per group regardless of input size, their
partials merge associatively (map-side combine works, any tree shape),
and — the property this module exists for — a PRE-AGGREGATED sketch
table replaces rescans forever: store one HLL sketch per (day, dim),
answer "distinct IPs over any date range" by unioning a handful of
kilobyte blobs instead of re-reading terabytes.

Determinism: a DENSE HLL register file is a per-bucket MAX over item
hashes — order- and partitioning-independent. At low cardinality the
library keeps exact coupon lists and promotes to dense mode at
partition-size-dependent points, so cross-cluster-size stability is the
rsd bound (~1.04/sqrt(2^lgk)), not byte equality — tests assert exactly
that. These are sketches, not oracles: exact twins live in the driver
queries (log_totals' exact distinct, log_latency_profile's exact
quantiles); tests bound the error instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, group_cols: list[str], key_col: str, lgk: int = 12
) -> DataFrame:
    """One DataSketches-HLL blob per group: ``group_cols + [hll_sketch]``.

    This is the WRITE side of the pre-aggregation pattern — persist the
    result (e.g. bucketed by the group key) and downstream distinct-count
    questions never touch the fact table again."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("hll_sketch")
    )


def estimate_distinct(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """READ side: union sketch blobs (optionally re-grouped coarser than
    they were written — day sketches roll up to months for free) and
    estimate. Dense-mode union is a per-register max (merge-tree-shape
    independent); a union can promote low-cardinality coupon-list
    sketches to dense HLL, so rollups of tiny groups agree with a direct
    sketch only within the rsd bound, not bit-for-bit (tested)."""
    g = sketches.groupBy(*(group_cols or []))
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("approx_distinct")
    )


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], key_col: str, rsd: float = 0.02
) -> DataFrame:
    """Single-shot HLL++ distinct count per group (no stored sketch):
    constant memory per group, partial-aggregable, ~rsd relative error."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group: rank error
    <= 1/accuracy of the group size, O(accuracy·log n) state vs the exact
    sort-based quantile's full-group sort (driver query
    log_latency_profile keeps the exact twin; this is the form that
    survives a hot key with 10^10 rows)."""
    cols = [
        F.percentile_approx(value_col, F.lit(float(p)), F.lit(accuracy)).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*cols)
