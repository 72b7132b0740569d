"""Distributed as-of join (point-in-time lookup).

The reference has no joins at all (SURVEY.md §2.7); this is one of the
canonical "operators Spark lacks" a log/training pipeline needs: attach to
every fact row the most recent dimension row at-or-before its timestamp
(config pushes, deploy markers, model-version flips, ad impressions before
a conversion). Spark has no ASOF JOIN; a naive range join explodes to
|fact| x |dim-rows-before| pairs. The classic distributed shape instead is
union + per-key ordered carry-forward:

    tag right rows 0 / left rows 1 -> union -> one shuffle on the key ->
    last(right_payload, ignoreNulls) over (key ORDER BY ts, tag
    ROWS UNBOUNDED PRECEDING .. CURRENT ROW) -> keep left rows

which is O((|L|+|R|) log) with exactly ONE shuffle, no row multiplication,
and inclusive (ts_right <= ts_left) semantics because the 0-tag sorts a
right row ahead of a co-timestamped left row. Matches DuckDB's native
ASOF LEFT JOIN (the driver oracle) when the right side is unique per
(key, ts) — callers dedupe ties first (asof-ties are undefined in every
engine; `dedupe_right="max"` does it here deterministically).

Skew note (100 TB): the window sorts one task per key. Keys here are
users/hosts/shards — bounded per-key volume by construction. For a truly
hot key, `asof_join_bucketed` pre-folds each (key, time-bucket) to its
last payload, prefix-carries the tiny per-bucket table, and broadcasts the
carry back — no task ever sorts the hot key's full history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_bucketed"]


def _prep(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    dedupe_right: str | None,
):
    """Common projection: right -> (on, _ats, _aval struct), left tagged."""
    payload = F.struct(
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c) for c in value_cols],
    )
    r = right.select(*on, F.col(right_ts).cast("long").alias("_ats"), payload.alias("_aval"))
    # SQL equality-join semantics (and DuckDB ASOF JOIN): a NULL key never
    # matches anything. Dropping null-key RIGHT rows gives null-key left
    # rows an empty partition -> null asof columns, exactly the LEFT JOIN
    # outcome — and stops all NULL keys piling into one hot partition.
    if on:
        r = r.na.drop(subset=list(on))
    if dedupe_right == "max":
        # deterministic tie-break: one row per (key, ts), greatest payload
        r = r.groupBy(*on, "_ats").agg(F.max("_aval").alias("_aval"))
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l = left.select(*on, F.col(left_ts).cast("long").alias("_ats"), lrow)
    return l, r


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    dedupe_right: str | None = "max",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, the right row with the greatest
    `right_ts` <= `left_ts` sharing `on` (inclusive, backward direction).

    Returns every left column plus `<value_col><suffix>` columns (null when
    no right row precedes) and `_ts<suffix>` (the matched right timestamp).
    `tolerance` (same units as the ts columns) nulls matches older than
    `left_ts - tolerance`. Timestamps must be integral (cast upstream:
    unix_micros for timestamps).
    """
    right_ts = right_ts or left_ts
    value_cols = value_cols or [c for c in right.columns if c not in set(on) | {right_ts}]
    l, r = _prep(left, right, on, left_ts, right_ts, value_cols, dedupe_right)
    aval_t = r.schema["_aval"].dataType
    lrow_t = l.schema["_lrow"].dataType
    u = l.withColumn("_aside", F.lit(1)).withColumn(
        "_aval", F.lit(None).cast(aval_t)
    ).unionByName(
        r.withColumn("_aside", F.lit(0)).withColumn("_lrow", F.lit(None).cast(lrow_t))
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_aside")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        u.withColumn("_m", F.last("_aval", ignorenulls=True).over(w))
        .filter(F.col("_aside") == 1)
    )
    return _emit(m, value_cols, tolerance, suffix)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    bucket: int = 3_600_000_000,
    tolerance: int | None = None,
    dedupe_right: str | None = "max",
    suffix: str = "_asof",
) -> DataFrame:
    """Skew-safe as-of join for hot keys: identical result to `asof_join`.

    Phase 1 folds the right side to one row per (key, time-bucket) — its
    last payload (groupBy, map-side combinable, no sort of the full
    history). Phase 2 prefix-carries those per-bucket lasts along the
    bucket axis per key (window over the TINY folded table: one row per
    active bucket). Phase 3 joins each left row to the carried state of
    the PREVIOUS bucket (equi-join, AQE-splittable) and resolves same-
    bucket right rows with a window partitioned by (key, bucket) — so the
    largest sort any task does is one bucket of one key, never the key's
    full history.
    """
    right_ts = right_ts or left_ts
    value_cols = value_cols or [c for c in right.columns if c not in set(on) | {right_ts}]
    l, r = _prep(left, right, on, left_ts, right_ts, value_cols, dedupe_right)
    bkt = lambda c: F.floor(F.col(c) / F.lit(bucket))  # noqa: E731
    r = r.withColumn("_bkt", bkt("_ats"))
    l = l.withColumn("_bkt", bkt("_ats"))
    # phase 1: last payload per (key, bucket) — max on (_ats-first struct)
    folded = r.groupBy(*on, "_bkt").agg(F.max(F.struct("_ats", "_aval")).alias("_last"))
    # phase 2: carry = last payload of any STRICTLY EARLIER bucket. The
    # carry must exist for LEFT-side buckets with no right rows too, so the
    # bucket axis is the union of both sides' active buckets (tiny: one row
    # per (key, bucket), map-side-combined distinct)
    buckets = (
        l.select(*on, "_bkt").unionByName(r.select(*on, "_bkt")).distinct()
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        buckets.join(folded, [*on, "_bkt"], "left")
        .withColumn("_carry", F.max("_last").over(wb))
        .select(*on, "_bkt", "_carry")
    )
    # phase 3: union left rows with same-bucket right rows, resolve within
    # the (key, bucket) window, fall back to the carried state
    aval_t = r.schema["_aval"].dataType
    lrow_t = l.schema["_lrow"].dataType
    u = (
        l.withColumn("_bkt", bkt("_ats"))
        .withColumn("_aside", F.lit(1))
        .withColumn("_aval", F.lit(None).cast(aval_t))
        .unionByName(
            r.withColumn("_aside", F.lit(0)).withColumn("_lrow", F.lit(None).cast(lrow_t))
        )
    )
    wk = (
        Window.partitionBy(*on, "_bkt")
        .orderBy("_ats", "_aside")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        u.withColumn("_inb", F.last("_aval", ignorenulls=True).over(wk))
        .filter(F.col("_aside") == 1)
        .join(carried, [*on, "_bkt"], "left")
        .withColumn("_m", F.coalesce(F.col("_inb"), F.col("_carry._aval")))
    )
    return _emit(m, value_cols, tolerance, suffix)


def _emit(m: DataFrame, value_cols: list[str], tolerance: int | None, suffix: str) -> DataFrame:
    if tolerance is not None:
        m = m.withColumn(
            "_m",
            F.when(F.col("_ats") - F.col("_m._rts") <= F.lit(tolerance), F.col("_m")),
        )
    return m.select(
        "_lrow.*",
        F.col("_m._rts").alias(f"_ts{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
