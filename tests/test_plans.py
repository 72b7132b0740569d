"""Plan audits: the physical-plan properties the 100 TB design depends on,
asserted so a refactor can't silently regress them.

Each test pins one claim from SURVEY.md §4 / BENCH.md:
  - filters and projections reach the parquet scan (pushdown + pruning)
  - dimension joins broadcast (no fact-side shuffle)
  - top-K plans TakeOrderedAndProject (no global sort)
  - candidate-pair joins are equi-joins (never a nested-loop / cartesian)
  - the packing prefix-sum's only single-partition exchange is the tiny
    bucket-totals frame, and the data shuffles exactly once
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_parquet_filter_and_column_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("source") == "src1")
        .select("doc_id", "n_chars")
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src1)]" in p
    # projection pruning: the scan must not read `text`
    assert "text" not in p.split("ReadSchema")[1].splitlines()[0]


def test_top_counts_plans_take_ordered(spark, sf_dir):
    from nginx_log_spark.reports import reports as R

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
        "source", "remote_addr"
    )
    p = plan(R.top_counts(df, "remote_addr", 100))
    assert "TakeOrderedAndProject" in p
    # the pct denominator is a broadcast of a 1-row agg, not a window
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_geoip_enrich_is_broadcast_equi_join(spark, sf_dir):
    from nginx_log_spark.enrich import default_cidr_table, enrich_geoip
    from nginx_log_spark.parity import parsed_log_df

    parsed = parsed_log_df(spark, sf_dir).filter(F.col("valid"))
    p = plan(enrich_geoip(parsed, default_cidr_table(), spark=spark))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # fact side must not shuffle


def test_lsh_pairs_is_equi_join(spark, sf_dir):
    from nginx_log_spark.functions import lsh_candidate_pairs, minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs, n_hashes=8, shingle_k=5)
    p = plan(lsh_candidate_pairs(sigs, band_size=4, max_bucket=100))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pack_offsets_single_partition_only_for_bucket_frame(spark):
    from nginx_log_spark.functions import pack_offsets

    seq = spark.range(1000).select(
        F.col("id"),
        F.array(F.lit(1)).alias("tokens"),
        F.lit(1).alias("n_tok"),
    )
    p = plan(pack_offsets(seq, "id", F.expr("id div 100"), 64))
    # exactly one SinglePartition exchange (the #buckets-row cumsum)...
    assert p.count("Arguments: SinglePartition") == 1
    # ...and two bucket-keyed hash exchanges: the groupBy's partial-agg
    # stream (#buckets rows/partition after map-side combine) and the ONE
    # data shuffle feeding the within-bucket window
    assert p.count("Arguments: hashpartitioning(_pk_bucket") == 2
    assert "BroadcastHashJoin" in p


def test_fused_report_partials_are_map_side(spark, sf_dir):
    """The fused report's JVM input is the partial-agg stream, never raw
    rows: the mapInArrow output schema is the 4-column partial shape."""
    from nginx_log_spark.parity import events_with_log_columns
    from nginx_log_spark.reports.reports import fused_reports_arrow

    seq = events_with_log_columns(spark, sf_dir).select("doc_id", "tokens", "n_tok")
    p = plan(fused_reports_arrow(seq))
    assert "dim_id" in p and "key0" in p
    assert "CartesianProduct" not in p


def test_rank_partials_has_no_per_dim_single_window(spark):
    """The fused tail's heavy ranking window must partition by the hash
    BUCKET as well as (dim, section) — a window keyed only by dim sorts the
    whole per-second dimension in one task at scale. The section totals
    must come from a broadcast-joined aggregate, not the big window."""
    from nginx_log_spark.reports import reports as R

    partials = spark.createDataFrame(
        [(6, f"k{i}", 1, 10) for i in range(50)],
        "dim_id int, key0 string, cnt long, bytes long",
    )
    p = plan(R._rank_partials(partials, 100))
    # phase-1 window partition spec includes the pmod(xxhash64(...)) bucket
    assert "pmod" in p and "xxhash64" in p
    # section totals ride a broadcast join, not window sums over the big set
    assert "BroadcastExchange" in p


def test_bad_code_breakdown_two_phase_rank(spark):
    """The standalone bad_code_breakdown must share the fused path's scale
    shape: phase-1 ranking partitions by (status, hash-bucket of request) —
    never a single task sorting a hot status's whole aggregate — and the
    section totals ride a broadcast join, not the big window."""
    from nginx_log_spark.reports import reports as R

    parsed = spark.createDataFrame(
        [(f"4{i % 2:02d}", f"GET /r{i} HTTP/1.1") for i in range(200)],
        "status string, request string",
    )
    df = R.bad_code_breakdown(parsed, 10)
    p = plan(df)
    assert "pmod" in p and "xxhash64" in p
    assert "BroadcastExchange" in p


def test_connected_components_round_is_equi_join(spark):
    """Each label-propagation round must be an equi-join + groupBy-min on
    uniform keys — never a cartesian/nested-loop — and the per-round
    localCheckpoint keeps the lineage flat (the plan of the returned frame
    does not contain the full join tower)."""
    from nginx_log_spark.functions import neardup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40, 2)], "id_a long, id_b long"
    )
    out = neardup_components(pairs)
    p = plan(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # lineage cut: the returned plan scans checkpointed RDDs, not the
    # original createDataFrame roots repeated once per round
    assert p.count("ExistingRDD") >= 1


def test_unigram_lm_join_broadcasts_no_cartesian(spark, docs):
    """The LM score-side joins must be broadcast (vocab + two 1-row
    frames) and the vocab cap a TakeOrderedAndProject — never a sorted
    shuffle join or a nested-loop over the fact table."""
    from nginx_log_spark.functions import unigram_logprob_score

    p = plan(unigram_logprob_score(docs))
    # word-keyed vocab join: broadcast hash (the hint is explicit); the
    # 1-row total/floor frames are broadcast nested-loop, which is fine —
    # what must never appear is an unbroadcast cartesian product
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_source_quota_cap_two_phase_window(spark, docs):
    """Phase-1 window must partition by (source, id-hash bucket) — the
    bucketed pre-rank — so no single task sorts a hot source's full rows;
    phase 2's exact per-source window only sees the filtered survivors."""
    from nginx_log_spark.functions import source_quota_cap
    from nginx_log_spark.functions.textstats import quality_columns

    p = plan(
        source_quota_cap(
            docs, quality_columns(F.col("text"))["quality_score"], k=5, buckets=8
        )
    )
    assert "xxhash64" in p and "pmod" in p  # bucketed phase-1 partition key
    assert p.count("Window") >= 2  # pre-rank + exact rank
    assert "CartesianProduct" not in p


def test_parse_json_lines_stays_in_codegen(spark, docs):
    """The JSON source must be scan -> codegen'd projections only: no
    Python eval stage, no exchange, and column pruning reaching parquet."""
    from nginx_log_spark.parse.json_source import parse_json_lines

    p = plan(parse_json_lines(docs.select(F.col("text").alias("line"))))
    assert "from_json" in p
    assert "EvalPython" not in p
    assert "Exchange" not in p
    assert "ReadSchema: struct<text:string>" in p


def test_dsir_plan_broadcasts_and_take_ordered(spark, docs):
    """DSIR's scale contract: the word->log-ratio scoring join is a
    BROADCAST of the capped vocab (the corpus-sized side never shuffles
    for the join), and the final top-k is TakeOrderedAndProject, not a
    global sort."""
    from nginx_log_spark.functions import dsir_select

    out = dsir_select(docs, F.col("source") == "src0", k=50)
    p = plan(out)
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    # no unbroadcast cartesian anywhere; the crossJoins against the 1-row
    # totals/oov aggregates plan as broadcast nested loops, which is the
    # intended (constant-size) shape
    assert "CartesianProduct" not in p


def test_top_fraction_gate_two_phase_window(spark, docs):
    """top_fraction_per_stratum must rank within (stratum, bucket) before
    the exact per-stratum window — two Window nodes, and the stratum-size
    lookup is a broadcast join."""
    from nginx_log_spark.functions import top_fraction_per_stratum

    out = top_fraction_per_stratum(
        docs, F.col("n_chars").cast("double"), 0.3, buckets=16
    )
    p = plan(out)
    assert p.count("Window") >= 2
    assert "BroadcastHashJoin" in p


def test_prefix_jaccard_is_equi_join_on_prefix(spark, docs):
    """Candidate generation must be an equi-join (on the prefix-shingle
    key), never a cartesian/nested-loop product; the per-doc rank window
    partitions by the uniform doc id."""
    from nginx_log_spark.functions import prefix_jaccard_pairs

    p = plan(prefix_jaccard_pairs(docs, shingle_k=5, threshold=0.7))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # bounded verify, not a re-join on shingles: either the array
    # intersect or (round 6, small-vocabulary gate) the popcount of the
    # per-doc bitset masks
    assert "array_intersect" in p or "bit_count" in p, p


def test_prefix_jaccard_freq_head_joins_broadcast(spark, docs):
    """Stop-shingle skew hardening of the RELATIONAL (large-vocabulary)
    path: with freq_head_bcast on and the in-row rank fast path disabled
    (rank_bcast_max=0), the Zipf-head frequency annotation must be
    BROADCAST joins (hot inner + the two anti-join exclusions) so the
    skewed shingle key never routes its row mass through one shuffle
    partition; only the bounded-df tail takes a shuffle join."""
    from nginx_log_spark.functions import prefix_jaccard_pairs

    p = plan(prefix_jaccard_pairs(docs, shingle_k=5, threshold=0.7,
                                  freq_head_bcast=64, rank_bcast_max=0))
    # head annotate + ex anti + freq anti, all hinted broadcast
    assert p.count("BroadcastHashJoin") >= 3, p


def test_prefix_jaccard_rank_bcast_path_no_window(spark, docs):
    """The round-6 broadcast-vocabulary fast path (default when the
    vocabulary fits) must compute prefixes in-row: no rank Window and no
    shuffle of the exploded shingle stream before the candidate join —
    the skewed shingle key appears only in the prefix equi-join, which
    holds each doc's RAREST shingles by construction."""
    from nginx_log_spark.functions import prefix_jaccard_pairs

    out = prefix_jaccard_pairs(docs, shingle_k=5, threshold=0.7)
    p = plan(out)
    assert "Window" not in p, p
    # the in-row MapInArrow prefix is materialized once (localCheckpoint,
    # round 6: it feeds both self-join sides) so the candidate join reads
    # the stored blocks, same pattern as the LSH banded proxy
    assert "ExistingRDD" in p, p
    assert "CartesianProduct" not in p
    # result identity with the relational path (exactness under any
    # global prefix order + exact verify)
    rel = prefix_jaccard_pairs(docs, shingle_k=5, threshold=0.7,
                               rank_bcast_max=0)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, rel.collect()))


def test_asof_join_single_window_no_range_join(spark, sf_dir):
    """The as-of join must be union + ONE carry-forward window — no
    range-condition join (which Spark can only execute as a nested-loop
    product) and no row multiplication."""
    from nginx_log_spark.functions import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "event_type",
    )
    out = asof_join(
        ev.filter(F.col("event_type") == "purchase").drop("event_type"),
        ev.filter(F.col("event_type") == "view").drop("event_type"),
        on=["user_id"], left_ts="us", value_cols=["event_id"],
    )
    p = plan(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p  # no join at all post-union
    # exactly ONE Window node (formatted output lists nodes twice:
    # tree + details — use the executed-plan tree instead)
    exe = out._jdf.queryExecution().executedPlan().toString()
    assert exe.count("Window") == 1
