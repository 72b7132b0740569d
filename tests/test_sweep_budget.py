"""Sweep-cost observability guard (r3 verdict ask #8).

The grading driver evaluates every registered query in one budgeted sweep;
in round 3 a single composite (docs_dedup_retain) silently grew to 34% of
the whole sf0.1 sweep — one more regression like that and a driver-side
timeout would erase multiple green rows at once. These tests fail CI when
any one query hogs the sweep budget, using the per-query timings the
sweep artifacts already record (tools/sweep.py writes them exactly so that
cost regressions are diagnosable from artifacts alone).

The artifacts are refreshed every round (tools/sweep.py); the guard also
cross-checks that the artifact still covers the registered query set, so
a stale file can't vacuously pass.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# a query is a hog only if it is BOTH a large share of the sweep AND slow
# in absolute terms — with a fast total sweep even a 40% share is harmless,
# and with a slow query a small share doesn't excuse it. The r3 offender
# (docs_dedup_retain, 1036s = 51% of spark time) fails both prongs.
MAX_SHARE = 0.30
ABS_OK = {"CORRECTNESS_LOCAL.json": 60.0, "CORRECTNESS_SF01.json": 300.0}
# hard ceiling at sf0.1 regardless of share (driver-timeout margin)
MAX_ABS_SF01 = 600.0
# artifact staleness: at most this many registered queries may be missing
# from the artifact (new queries land before the next full re-sweep)
MAX_MISSING = 5


def _load(name: str) -> dict:
    p = REPO / name
    if not p.exists():
        pytest.skip(f"{name} not present (run tools/sweep.py)")
    d = json.loads(p.read_text())
    return d["queries"] if "queries" in d else d


def _registered() -> set[str]:
    from nginx_log_spark import driver_queries as dq

    return set(dq.queries())


@pytest.mark.parametrize(
    "artifact,abs_cap",
    [("CORRECTNESS_LOCAL.json", None), ("CORRECTNESS_SF01.json", MAX_ABS_SF01)],
)
def test_no_single_query_hogs_the_sweep(artifact, abs_cap):
    qs = _load(artifact)
    timed = {k: v["spark_sec"] for k, v in qs.items() if v.get("spark_sec")}
    assert timed, f"{artifact} has no per-query timings"
    total = sum(timed.values())
    worst_q, worst = max(timed.items(), key=lambda kv: kv[1])
    assert worst <= max(MAX_SHARE * total, ABS_OK[artifact]), (
        f"{artifact}: {worst_q} costs {worst:.0f}s = {worst / total:.0%} of the "
        f"{total:.0f}s sweep (caps: {MAX_SHARE:.0%} share, {ABS_OK[artifact]:.0f}s "
        "absolute) — stage/cache its shared inputs or split the composite "
        "before the driver sweep times out"
    )
    if abs_cap is not None:
        assert worst <= abs_cap, (
            f"{artifact}: {worst_q} costs {worst:.0f}s (cap {abs_cap:.0f}s)"
        )


# Per-query ceilings for the historically expensive composites at sf0.1
# (r4 verdict ask #5: the final-round insurance against any one of these
# regressing back toward the r3 docs_dedup_retain incident, where one
# composite silently grew to 1036s). Bounds are ~3x the round-4 pinned
# costs — wide enough for the documented VM wall-clock swing, tight
# enough that an algorithmic regression (a lost filter, a de-shared
# cache, an accidental re-derivation) trips them immediately.
SF01_CEILINGS = {
    "docs_dedup_retain": 180.0,  # r4: 62s (was 1036s in r3)
    "docs_pair_scores": 140.0,   # r4: 46s (was 275s in r3)
    "emb_neardup_pairs": 90.0,   # r4: 30s
    "seq_packing": 80.0,         # r4: 25s
    "log_token_stats": 70.0,     # r4: 22s
}


def test_top5_sweep_costs_pinned_at_sf01():
    qs = _load("CORRECTNESS_SF01.json")
    over = {
        name: (qs[name].get("spark_sec"), cap)
        for name, cap in SF01_CEILINGS.items()
        if name in qs and (qs[name].get("spark_sec") or 0) > cap
    }
    assert not over, (
        "sf0.1 per-query ceilings exceeded (algorithmic regression in a "
        f"pinned composite): {over} — re-check shared caches / prefix "
        "filters before the driver sweep pays for it"
    )
    # the pin list must keep covering the actual top of the cost table:
    # if some OTHER query grows past every pinned one, the pins are stale
    timed = {k: v["spark_sec"] for k, v in qs.items() if v.get("spark_sec")}
    top5 = {k for k, _ in sorted(timed.items(), key=lambda kv: -kv[1])[:5]}
    unpinned_top = top5 - set(SF01_CEILINGS)
    assert all(timed[q] <= max(SF01_CEILINGS.values()) for q in unpinned_top), (
        f"unpinned queries now dominate the sf0.1 sweep: "
        f"{ {q: timed[q] for q in unpinned_top} } — extend SF01_CEILINGS"
    )


def test_sweep_artifact_covers_registry():
    qs = _load("CORRECTNESS_LOCAL.json")
    missing = _registered() - set(qs)
    assert len(missing) <= MAX_MISSING, (
        f"{len(missing)} registered queries missing from CORRECTNESS_LOCAL.json "
        f"(stale artifact — rerun tools/sweep.py): {sorted(missing)[:10]}"
    )
