"""Token-entropy operator: exact fixed-point parity with a Python oracle.

The reference engine never inspects byte distributions (it parses and
discards, c/main.c:407-478); this surface is the training-pipeline side.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from nginx_log_spark.functions import doc_entropy_histogram, token_entropy_e6


def _py_e6(t):
    if not t:
        return None
    n = len(t)
    s = sum(c * round(math.log(c) * 1e6) for c in Counter(t).values())
    v = math.log(n) * 1e6 - s / n
    # Spark round() is HALF_UP; Python round() is banker's. Match HALF_UP.
    return math.floor(v + 0.5)


def test_entropy_matches_python_oracle(spark):
    rng = random.Random(7)
    rows = [
        ([rng.randrange(1, 1 + rng.choice([2, 8, 64, 256]))
          for _ in range(rng.randrange(1, 400))],)
        for _ in range(300)
    ]
    rows += [([],), (None,), ([5],), ([9] * 1000,), (list(range(257)),)]
    df = spark.createDataFrame(rows, "tokens: array<int>")
    got = [r.e for r in df.select(token_entropy_e6().alias("e")).collect()]
    exp = [_py_e6(t) for (t,) in rows]
    assert got == exp


def test_entropy_bounds(spark):
    # H in [0, ln(n)]: constant arrays at 0, all-distinct at ln(n).
    df = spark.createDataFrame(
        [([3] * 50,), (list(range(50)),)], "tokens: array<int>"
    )
    lo, hi = [r.e for r in df.select(token_entropy_e6().alias("e")).collect()]
    assert lo == 0
    assert hi == round(math.log(50) * 1e6)


def test_histogram_counts_docs_once(spark):
    rows = [([1, 2],)] * 10 + [([7] * 4,)] * 3 + [([],)] * 2
    df = spark.createDataFrame(rows, "tokens: array<int>")
    h = {r.bucket: r.n_docs for r in doc_entropy_histogram(df).collect()}
    # ln(2) ~ 0.693 -> bucket 6; constant -> bucket 0; empties dropped.
    assert h == {6: 10, 0: 3}


def test_entropy_plan_is_shuffle_free_per_doc(spark):
    # The per-doc projection must not shuffle; only the bucket agg does.
    df = spark.createDataFrame([([1, 2, 3],)], "tokens: array<int>")
    plan = df.select(token_entropy_e6().alias("e"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
