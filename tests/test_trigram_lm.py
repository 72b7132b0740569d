"""Trigram stupid-backoff LM (functions/textstats.py trigram_backoff_score).

A pure-Python mirror recomputes the exact integer fixed-point pipeline
(model caps, tie-breaks, backoff chain) on a tiny corpus whose caps are
set so every backoff tier actually fires; Spark must match to the BIGINT.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from nginx_log_spark.functions import trigram_backoff_score
from nginx_log_spark.functions.textstats import BACKOFF_ALPHA_E6

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat sat on the hat"),
    ("d3", "the dog sat on the mat"),
    ("d4", "a cat"),          # < 3 words -> 0 trigrams
    ("d5", ""),               # empty
    ("d6", "zebra quark zebra quark zebra"),  # rare grams -> backoff
]

TOP_T, TOP_B, TOP_V = 4, 5, 4


def _round_half_up(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _e6(p: float) -> int:
    return _round_half_up(math.log(p) * 1e6)


def _mirror() -> dict[str, tuple]:
    toks = {d: t.lower().split() for d, t in DOCS}
    words = [w for ws in toks.values() for w in ws]
    pairs = [f"{ws[i]} {ws[i+1]}" for ws in toks.values() for i in range(len(ws) - 1)]
    tris = [
        f"{ws[i]} {ws[i+1]} {ws[i+2]}"
        for ws in toks.values()
        for i in range(len(ws) - 2)
    ]
    c1, c2, c3 = Counter(words), Counter(pairs), Counter(tris)
    n = len(words)

    uv = {
        w: _e6(c / n)
        for w, c in sorted(c1.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_V]
    }
    floor = _e6(1.0 / n)
    cw1 = Counter(p.split()[0] for p in pairs)
    bv = {
        p: _e6(c / cw1[p.split()[0]])
        for p, c in sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_B]
    }
    tv = {
        t: _e6(c / c2[" ".join(t.split()[:2])])
        for t, c in sorted(c3.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_T]
    }

    out = {}
    for d, ws in toks.items():
        doc_tris = [f"{ws[i]} {ws[i+1]} {ws[i+2]}" for i in range(len(ws) - 2)]
        nt, bo_bi, bo_uni, s = len(doc_tris), 0, 0, 0
        for t in doc_tris:
            w = t.split()
            p23 = f"{w[1]} {w[2]}"
            if t in tv:
                s += tv[t]
            elif p23 in bv:
                bo_bi += 1
                s += BACKOFF_ALPHA_E6 + bv[p23]
            else:
                bo_uni += 1
                s += 2 * BACKOFF_ALPHA_E6 + uv.get(w[2], floor)
        avg = _round_half_up(-s / nt) if nt else 0
        out[d] = (nt, bo_bi, bo_uni, s, avg)
    return out


def test_trigram_backoff_matches_mirror(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        r["doc_id"]: (
            r["n_trigrams"], r["n_bo_bi"], r["n_bo_uni"],
            r["sum_tlp_e6"], r["avg_tnll_e6"],
        )
        for r in trigram_backoff_score(
            df, top_t=TOP_T, top_b=TOP_B, top_v=TOP_V
        ).collect()
    }
    exp = _mirror()
    assert got == exp
    # the fixture must actually exercise every tier, or the test is vacuous
    assert sum(v[1] for v in exp.values()) > 0, "no bigram backoff fired"
    assert sum(v[2] for v in exp.values()) > 0, "no unigram backoff fired"
    assert any(v[0] > 0 and v[1] == 0 and v[2] == 0 for v in exp.values()), (
        "no fully in-model doc"
    )
    assert exp["d4"][0] == 0 and exp["d5"][0] == 0


def test_trigram_plan_is_broadcast(spark):
    """All three model joins must be broadcast — the fact never shuffles
    except the final by-doc aggregation."""
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = (
        trigram_backoff_score(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
