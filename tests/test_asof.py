"""As-of join: brute-force oracle parity, tie/tolerance semantics, and the
skew-safe bucketed variant's exact equivalence to the windowed one."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.functions import asof_join, asof_join_bucketed


def _mk(spark, seed=7, n_left=200, n_right=120, keys=6):
    rng = random.Random(seed)
    left = [
        (i, rng.randrange(keys), rng.randrange(0, 10_000))
        for i in range(n_left)
    ]
    right = [
        (1000 + j, rng.randrange(keys), rng.randrange(0, 10_000), f"v{j}")
        for j in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right, "rid long, k long, ts long, payload string")
    return left, right, ldf, rdf


def _oracle(left, right, tolerance=None):
    """Brute force: per left row, right row with max ts <= left ts (ties ->
    max (payload, rid) like dedupe_right='max' on struct(_rts, values))."""
    out = {}
    for lid, k, lts in left:
        best = None
        for rid, rk, rts, payload in right:
            if rk != k or rts > lts:
                continue
            if tolerance is not None and lts - rts > tolerance:
                continue
            cand = (rts, payload, rid)
            if best is None or cand > best:
                best = cand
        out[lid] = (best[0], best[1]) if best else (None, None)
    return out


def _collect(df):
    return {
        r["lid"]: (r["_ts_asof"], r["payload_asof"])
        for r in df.collect()
    }


@pytest.mark.parametrize("fn", [asof_join, asof_join_bucketed])
def test_asof_matches_bruteforce(spark, fn):
    left, right, ldf, rdf = _mk(spark)
    got = _collect(
        fn(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload", "rid"])
    )
    exp = _oracle(left, right)
    assert got == exp
    assert len(got) == len(left)  # every left row survives (left join)


@pytest.mark.parametrize("fn", [asof_join, asof_join_bucketed])
def test_asof_inclusive_and_ties(spark, fn):
    ldf = spark.createDataFrame([(1, 0, 100), (2, 0, 99)], "lid long, k long, ts long")
    rdf = spark.createDataFrame(
        [(10, 0, 100, "a"), (11, 0, 100, "b"), (12, 0, 50, "old")],
        "rid long, k long, ts long, payload string",
    )
    got = _collect(fn(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"]))
    # inclusive: the co-timestamped right row matches; tie at ts=100 is
    # resolved to the max payload deterministically
    assert got[1] == (100, "b")
    assert got[2] == (50, "old")


@pytest.mark.parametrize("fn", [asof_join, asof_join_bucketed])
def test_asof_tolerance(spark, fn):
    left, right, ldf, rdf = _mk(spark, seed=11)
    got = _collect(
        fn(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload", "rid"], tolerance=500)
    )
    exp = _oracle(left, right, tolerance=500)
    assert got == exp
    assert any(v == (None, None) for v in got.values())  # tolerance bites


def test_bucketed_equals_windowed_across_bucket_sizes(spark):
    left, right, ldf, rdf = _mk(spark, seed=13, n_left=300, n_right=200)
    base = _collect(asof_join(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"]))
    for bucket in (1, 7, 100, 10_000, 10**12):
        got = _collect(
            asof_join_bucketed(
                ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"], bucket=bucket
            )
        )
        assert got == base, f"bucket={bucket}"


def test_asof_plan_has_no_range_explosion(spark):
    _, _, ldf, rdf = _mk(spark)
    for fn in (asof_join, asof_join_bucketed):
        out = fn(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"])
        s = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in s
        assert "BroadcastNestedLoopJoin" not in s


def test_asof_keeps_all_left_columns(spark):
    _, _, ldf, rdf = _mk(spark)
    out = asof_join(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"])
    assert out.columns == ["lid", "k", "ts", "_ts_asof", "payload_asof"]


@pytest.mark.parametrize("fn", [asof_join, asof_join_bucketed])
def test_asof_null_keys_never_match(spark, fn):
    """SQL equality semantics: NULL join keys match nothing (DuckDB's
    ASOF LEFT JOIN ON equality behaves the same) — a null-key left row
    gets null asof columns even when a null-key right row precedes it."""
    ldf = spark.createDataFrame(
        [(1, None, 100), (2, 0, 100)], "lid long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        [(10, None, 50, "nullkey"), (11, 0, 50, "real")],
        "rid long, k long, ts long, payload string",
    )
    got = _collect(fn(ldf, rdf, on=["k"], left_ts="ts", value_cols=["payload"]))
    assert got[1] == (None, None)  # NULL never equals NULL
    assert got[2] == (50, "real")
