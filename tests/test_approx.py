"""Sketch aggregates: error bounds, merge associativity, and the
cluster-size invariance that makes a stored sketch table trustworthy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.functions.approx import (
    approx_distinct_by,
    approx_quantiles_by,
    distinct_sketches,
    estimate_distinct,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hll_estimate_within_rsd(spark, docs):
    exact = docs.select("doc_id").distinct().count()
    got = estimate_distinct(distinct_sketches(docs, [], "doc_id", lgk=12)).first()[
        "approx_distinct"
    ]
    # lgk=12 -> rsd ~ 1.04/sqrt(4096) ~ 1.6%; allow 3 sigma
    assert abs(got - exact) / exact < 0.05


def test_hll_sketches_roll_up(spark, docs):
    # day->month analogue: per-source sketches unioned ~= whole-table
    # sketch. Not bit-identical: the union promotes low-cardinality
    # coupon-list sketches to dense HLL mode, so only the rsd bound holds.
    per_source = estimate_distinct(
        distinct_sketches(docs, ["source"], "doc_id"), group_cols=[]
    ).first()["approx_distinct"]
    whole = estimate_distinct(distinct_sketches(docs, [], "doc_id")).first()[
        "approx_distinct"
    ]
    assert abs(per_source - whole) / whole < 0.05


def test_hll_partitioning_invariance(spark, docs):
    # the estimate must not depend MATERIALLY on how the cluster split
    # the scan; partial-sketch mode promotion (coupon list vs dense HLL)
    # varies with partition sizes, so the guarantee is the rsd bound,
    # not bit equality
    a = estimate_distinct(distinct_sketches(docs.repartition(3), [], "doc_id")).first()[
        "approx_distinct"
    ]
    b = estimate_distinct(
        distinct_sketches(docs.repartition(17, "source"), [], "doc_id")
    ).first()["approx_distinct"]
    assert abs(a - b) / max(a, b) < 0.05


def test_approx_count_distinct_grouped(spark, docs):
    got = {
        r["source"]: r["approx_distinct"]
        for r in approx_distinct_by(docs, ["source"], "doc_id").collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for s, n in exact.items():
        assert abs(got[s] - n) / max(n, 1) < 0.1


def test_approx_quantiles_rank_error(spark, docs):
    got = approx_quantiles_by(docs, [], "n_chars", probs=[0.5], accuracy=10_000).first()[
        "p5"
    ]
    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    # rank error <= n/accuracy around the true median position
    n = len(vals)
    tol = max(1, n // 10_000)
    lo, hi = vals[max(0, n // 2 - tol - 1)], vals[min(n - 1, n // 2 + tol + 1)]
    assert lo <= got <= hi


def test_sketch_agg_is_partial_aggregable(spark, docs):
    # partial HashAggregate before the exchange = map-side combine works;
    # the shuffle carries one blob per (partition, group), never rows
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        distinct_sketches(docs, ["source"], "doc_id").explain("formatted")
    p = buf.getvalue()
    assert p.count("HashAggregate") >= 2 or "ObjectHashAggregate" in p
