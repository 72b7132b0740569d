#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The log-pipeline queries run over a deterministic 2M-line tokenized table
(same scale as the reference's published benchmark: ~2M lines / 700 MB,
README.MD:43) generated once and cached as parquet under /tmp.

--scaling: run the SAME pipeline job in two fresh subprocesses at
local[N] and local[4N] and print throughput + efficiency = (T_N/T_4N)/4
(the sandbox stand-in for the north-rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
SEQ_CACHE = os.environ.get(
    "SPARK_GRAFT_SEQ_CACHE", f"/tmp/nginx_log_spark_bench/seq_{BENCH_ROWS}.parquet"
)


def _get_spark(cpus: int):
    from nginx_log_spark.session import get_spark

    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cpus, 8)))
    extra = {}
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb:
        extra["spark.sql.files.maxPartitionBytes"] = mpb
        extra["spark.sql.files.openCostInBytes"] = "1048576"
    return get_spark(app="nginx_log_spark-bench", master=f"local[{cpus}]",
                     shuffle_partitions=shuffle, extra=extra)


def _ensure_seq(spark):
    ok = Path(SEQ_CACHE, "_SUCCESS")
    if not ok.exists():
        from nginx_log_spark.datagen import write_sequences

        write_sequences(spark, BENCH_ROWS, SEQ_CACHE, partitions=max(CPUS * 2, 16))
    return spark.read.parquet(SEQ_CACHE)


def _timed(fn, label: str = "") -> float:
    t0 = time.perf_counter()
    fn()
    dt = round(time.perf_counter() - t0, 3)
    if label:
        print(f"[bench] {label}: {dt}s", file=sys.stderr, flush=True)
    return dt


def pipeline_job(spark, seq):
    """The reference's whole job: parse once, compute ALL aggregates
    (c/main.c:407-523) — the scaling-efficiency workload. One fused
    mapInArrow pass (parse + per-partition partial agg, no Arrow field
    shipping) -> tiny final agg -> window top-K."""
    from nginx_log_spark.reports.reports import fused_reports_arrow

    fused_reports_arrow(seq).collect()


def _group_queries(spark, group: str) -> dict[str, float]:
    """One benchmark group per fresh JVM (local-mode JVMs accumulate GC /
    python-worker state across many jobs, which pollutes later timings —
    measured 16s -> 78s on the identical query within one session)."""
    from pyspark.sql import functions as F

    queries: dict[str, float] = {}
    if group == "parse":
        seq = _ensure_seq(spark)
        seq.count()

        def q_parse_count():
            from nginx_log_spark.parse import parse_sequences

            parse_sequences(seq).filter(F.col("valid")).count()

        queries["parse_2m_lines"] = _timed(q_parse_count, "parse_2m_lines")
        queries["full_report_job"] = _timed(
            lambda: pipeline_job(spark, seq), "full_report_job"
        )
    elif group == "enrich_route":
        seq = _ensure_seq(spark)
        seq.count()

        def q_enrich():
            from nginx_log_spark.enrich import default_cidr_table, enrich_geoip, enrich_ua
            from nginx_log_spark.parse import parse_sequences

            df = enrich_ua(
                enrich_geoip(
                    parse_sequences(seq).filter(F.col("valid")),
                    default_cidr_table(),
                    spark=spark,
                )
            )
            df.groupBy("country", "ua_class").count().collect()

        queries["enrich_geo_ua"] = _timed(q_enrich, "enrich_geo_ua")

        def q_route():
            from nginx_log_spark.parse import parse_sequences
            from nginx_log_spark.route import fan_out_write

            fan_out_write(parse_sequences(seq), "/tmp/nginx_log_spark_bench/sinks")

        queries["route_fanout_write"] = _timed(q_route, "route_fanout_write")
    elif group == "ops":
        from nginx_log_spark import driver_queries as Q

        queries["tpch_q1"] = _timed(lambda: Q.tpch_q1(spark, SF_DIR).collect(), "tpch_q1")
        queries["docs_exact_dedup"] = _timed(
            lambda: Q.docs_exact_dedup(spark, SF_DIR).collect(), "docs_exact_dedup"
        )

        def q_minhash():
            from nginx_log_spark.functions import lsh_candidate_pairs, minhash_signatures

            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            sigs = minhash_signatures(docs, n_hashes=8, shingle_k=5)
            lsh_candidate_pairs(sigs, band_size=4, max_bucket=100).count()

        queries["docs_minhash_lsh"] = _timed(q_minhash, "docs_minhash_lsh")
        queries["emb_cosine_topk"] = _timed(
            lambda: Q.emb_cosine_topk(spark, SF_DIR).collect(), "emb_cosine_topk"
        )
    return queries


def run_group_child(group: str) -> None:
    spark = _get_spark(CPUS)
    q = _group_queries(spark, group)
    meta = {}
    if group == "parse":
        from pyspark.sql import functions as F

        seq = spark.read.parquet(SEQ_CACHE)
        meta = {"rows": seq.count(), "tokens": int(seq.agg(F.sum("n_tok")).first()[0])}
    print("@@RESULT@@" + json.dumps({"queries": q, **meta}))
    spark.stop()


def run_bench() -> dict:
    # make sure the fixture exists before timing anything
    spark = _get_spark(CPUS)
    _ensure_seq(spark)
    spark.stop()

    queries: dict[str, float] = {}
    meta: dict = {}
    for group in ("parse", "enrich_route", "ops"):
        r = subprocess.run(
            [sys.executable, __file__, "--group-child", group],
            capture_output=True, text=True, timeout=3000, env=os.environ,
        )
        for l in r.stderr.splitlines():
            if l.startswith("[bench]"):
                print(l, file=sys.stderr, flush=True)
        lines = [l for l in r.stdout.splitlines() if l.startswith("@@RESULT@@")]
        if not lines:
            raise RuntimeError(f"group {group} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        payload = json.loads(lines[-1][len("@@RESULT@@"):])
        queries.update(payload.pop("queries"))
        meta.update(payload)

    n_rows, n_tokens = meta["rows"], meta["tokens"]
    total = round(sum(queries.values()), 3)
    parse_sec = max(queries["parse_2m_lines"], 1e-9)
    return {
        "metric": "end-to-end parse+report wall time (2M tokenized lines) + operator suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "rows": n_rows,
        "tokens": n_tokens,
        "cpus": CPUS,
        "lines_per_sec": int(n_rows / parse_sec),
        "tokens_per_sec": int(n_tokens / parse_sec),
        "report_job_lines_per_sec": int(n_rows / max(queries["full_report_job"], 1e-9)),
    }


def run_scaling_child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from nginx_log_spark.parse import parse_sequences

    spark = _get_spark(cpus)
    seq = _ensure_seq(spark)
    n = seq.count()  # warm file listing
    # warm python workers + JIT with a DIFFERENT job (a repeated identical
    # job would reuse its shuffle stages and time ~0); then min-of-3 — the
    # python worker pool warms unevenly and single runs are noisy
    parse_sequences(seq).filter(F.col("valid")).count()
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    ts = [
        _timed(lambda: pipeline_job(spark, seq), f"pipeline@local[{cpus}] run{i}")
        for i in range(n_runs)
    ]
    print(json.dumps({"cpus": cpus, "sec": min(ts), "runs": ts, "rows": n}))
    spark.stop()


SCALING_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "8000000"))


def run_scaling(n_small: int = 8) -> dict:
    """Same job, two parallelism levels, fresh JVM each (master is fixed
    per-JVM). Efficiency = (T_small / T_big) / (big/small cores).

    The scaling input is 4x the bench fixture (8M lines) so per-core work
    dominates fixed scheduling overhead, and the shuffle width is PINNED
    (64) in both runs — the identical physical job, different core counts.
    """
    cache = f"/tmp/nginx_log_spark_bench/seq_{SCALING_ROWS}.parquet"
    if not Path(cache, "_SUCCESS").exists():
        # generate once, parent-side, with 128 files so BOTH children read
        # the identical layout with enough splits for 4N cores
        from nginx_log_spark.datagen import write_sequences

        spark = _get_spark(CPUS)
        write_sequences(spark, SCALING_ROWS, cache, partitions=128)
        spark.stop()

    out = {}
    for cpus in (n_small, n_small * 4):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_BENCH_ROWS=str(SCALING_ROWS),
            SPARK_GRAFT_SEQ_CACHE=cache,
            SPARK_GRAFT_SHUFFLE_PARTITIONS="64",
            SPARK_GRAFT_MAX_PARTITION_BYTES="8388608",
        )
        # pin the whole child (JVM + python workers) to exactly `cpus`
        # cores — local[N] alone still lets the JVM feed threads borrow
        # idle cores, flattering the small configuration
        cmd = [sys.executable, __file__, "--scaling-child", str(cpus)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        r = subprocess.run(
            cmd, capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)
    t_small, t_big = out[n_small]["sec"], out[n_small * 4]["sec"]
    rows = out[n_small]["rows"]
    eff = round((t_small / t_big) / 4.0, 3)
    return {
        "metric": "scaling efficiency local[N] -> local[4N]",
        "value": eff,
        "unit": "ratio",
        "n_small": n_small,
        "n_big": n_small * 4,
        "sec_small": t_small,
        "sec_big": t_big,
        "rows": rows,
        "lines_per_sec_small": int(rows / t_small),
        "lines_per_sec_big": int(rows / t_big),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--group-child" in sys.argv:
        run_group_child(sys.argv[sys.argv.index("--group-child") + 1])
    elif "--scaling-child" in sys.argv:
        run_scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(int(os.environ.get("SPARK_GRAFT_SCALING_N", "8")))))
    else:
        print(json.dumps(run_bench()))
