#!/usr/bin/env python
"""Cluster job entrypoint: the full training-data curation recipe.

Chains the §2.10 operator surface into ONE resumable spark-submit job over
a documents table (doc_id, text, lang, source, ...):

    1. incremental exact dedup against the persistent digest index
       (functions/dedup.py::incremental_dedup — the index survives across
       runs, so re-ingesting yesterday's corpus is a no-op)
    2. curation gate: quality / language / repetition routing
       (functions/textstats.py::quality_route) — only 'keep' continues
    2b. (optional, --classifier-ref) trained-filter stage, the GPT-3 §A
       recipe: fit a hashed-NB classifier with the reference corpus as
       positives and a deterministic hash-sample of the gated crawl as
       negatives (functions/classifier.nb_fit), score everything, keep
       docs the model calls reference-like (nb_score)
    3. near-dup removal: the LSH chain (banded candidates -> pairs-bounded
       verify -> min-id retain)
    4. decontamination against a held-out split (distinct-gram semi-join)
    5. per-source domain cap + adaptive top-fraction quality gate
    6. write the curated corpus + dataset card (per-source accounting)

Submit:
    python package.py
    spark-submit --py-files dist/nginx_log_spark.zip jobs/run_curation.py \
        --input <documents parquet> --output <base path> \
        [--holdout <parquet of eval docs>] [--source-cap 100000] \
        [--keep-frac 0.5] [--classifier-ref <parquet of reference docs>]

Resume: each stage writes ``<output>/<stage>/`` exactly once and is skipped
when its ``_SUCCESS`` marker exists — a restarted job recomputes only the
unfinished suffix of the chain. The digest index additionally makes stage 1
idempotent at the ROW level across separate ingest runs.

Scale notes (the 100 TB story): stage 1's anti-join shuffles only the new
batch (the index is digest-bucketed on real deployments); stage 2 is a pure
projection; stage 3 is the bucket-capped LSH chain; stage 4 semi-joins
against the (small) holdout's distinct grams; stage 5 is the two-phase
bucketed rank — no task ever sorts a hot domain's full row set.
"""

from __future__ import annotations

import argparse


def run_curation(
    spark,
    docs,
    out_base: str,
    holdout=None,
    source_cap: int = 100_000,
    keep_frac: float = 0.5,
    shingle_k: int = 5,
    neardup_threshold: float = 0.7,
    decontam_k: int = 20,
    gate_kwargs: dict | None = None,
    index_dir: str | None = None,
    classifier_ref=None,
    classifier_neg_rate: float = 0.5,
    classifier_dims: int = 1024,
):
    """Run the chain; returns the final curated DataFrame. Each stage
    persists to ``out_base/<stage>`` and is skipped when already complete,
    so the function doubles as the resume path. Markers are probed through
    the Hadoop FileSystem API so resume works when out_base is HDFS/S3A —
    a driver-local Path check there would always say "not done" and stage 1
    would re-dedup against an index that already holds this batch's
    digests, silently emptying the curated output."""
    from pyspark.sql import functions as F

    from nginx_log_spark.fsutil import mark_dir, path_exists, read_parquet_or_empty

    def _done(path: str) -> bool:
        return path_exists(spark, f"{path}/_SUCCESS")

    from nginx_log_spark.functions import (
        dedup_keep,
        incremental_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        source_quota_cap,
        split_contamination,
        top_fraction_per_stratum,
        verify_pairs_jaccard,
    )
    from nginx_log_spark.functions.textstats import quality_columns, quality_route

    gate_kwargs = dict(gate_kwargs or {})

    stages: list[tuple[str, object]] = []

    # A stage whose input was fully deduped away writes an EMPTY
    # partitioned dataset (only _SUCCESS, no part files) — a legitimate
    # outcome for a re-ingested batch, not an error. Reading such a path
    # cannot infer a schema, so every read-back falls back to an empty
    # frame with the stage's known schema.
    from pyspark.sql.types import BooleanType, StringType, StructField, StructType

    base_schema = StructType(list(docs.schema.fields))
    digest_schema = StructType(
        list(base_schema.fields) + [StructField("digest", StringType())]
    )
    gate_schema = StructType(
        list(base_schema.fields)
        + [StructField("reason", StringType()), StructField("kept", BooleanType())]
    )

    def _read(path: str, schema):
        return read_parquet_or_empty(spark, path, schema)

    # -- 1. incremental exact dedup vs the persistent digest index --------
    p1 = f"{out_base}/stage1_exact"
    # the digest index may be SHARED across ingest runs (pass the same
    # index_dir to every run): re-ingesting an already-seen batch then
    # keeps zero docs, which is the whole point
    idx = index_dir or f"{out_base}/digest_index"
    if not _done(p1):
        seen = read_parquet_or_empty(spark, idx, "digest string")
        incremental_dedup(docs, seen).write.mode("overwrite").parquet(p1)
    # the index append carries its own marker so a crash between the two
    # writes can't orphan this batch's digests; a replayed append at worst
    # duplicates digest rows, which the anti-join's distinct absorbs
    p1m = f"{out_base}/stage1_index_appended"
    if not path_exists(spark, p1m):
        _read(p1, digest_schema).select("digest").write.mode("append").parquet(idx)
        mark_dir(spark, p1m)
    s1 = _read(p1, digest_schema).drop("digest")
    stages.append(("exact_dedup", s1))

    # -- 2. curation gate (quality / lang / repetition) --------------------
    p2 = f"{out_base}/stage2_gate"
    if not _done(p2):
        verdicts = quality_route(s1, **gate_kwargs).select(
            "doc_id", "reason", "kept"
        )
        s1.join(verdicts, "doc_id").write.mode("overwrite").partitionBy(
            "reason"
        ).parquet(p2)
    s2 = _read(p2, gate_schema).filter(F.col("kept")).drop("reason", "kept")
    stages.append(("quality_gate", s2))

    # -- 2b. trained filter (reference-vs-crawl NB classifier) -------------
    # GPT-3 §A: positives = the high-quality reference corpus, negatives =
    # a deterministic hash-sample of the crawl itself (so the negative set
    # is reproducible on any cluster size); keep what the model scores as
    # reference-like. The fitted model is |labels| x dims rows — it never
    # grows with the corpus, so this stage is a broadcast join at 100 TB.
    if classifier_ref is not None:
        from nginx_log_spark.functions import hash_sample, nb_fit, nb_score

        p2b = f"{out_base}/stage2b_classifier"
        if not _done(p2b):
            neg = hash_sample(s2, classifier_neg_rate, "doc_id", seed="nbneg")
            labeled = classifier_ref.select(
                F.col("text"), F.lit("ref").alias("_nb_label")
            ).unionAll(neg.select("text", F.lit("crawl").alias("_nb_label")))
            model, priors = nb_fit(labeled, label_col="_nb_label", dims=classifier_dims)
            verdicts = nb_score(s2, model, priors, dims=classifier_dims)
            s2.join(
                verdicts.filter(F.col("nb_pred") == "ref").select("doc_id"), "doc_id"
            ).write.mode("overwrite").parquet(p2b)
        s2 = _read(p2b, base_schema)
        stages.append(("trained_filter", s2))

    # -- 3. near-dup removal (LSH chain) -----------------------------------
    p3 = f"{out_base}/stage3_neardup"
    if not _done(p3):
        sigs = minhash_signatures(s2, n_hashes=8, shingle_k=shingle_k)
        cands = lsh_candidate_pairs(sigs, band_size=4, max_bucket=200)
        pairs = verify_pairs_jaccard(
            s2, cands, shingle_k=shingle_k, threshold=neardup_threshold
        )
        dedup_keep(s2, pairs).write.mode("overwrite").parquet(p3)
    s3 = _read(p3, base_schema)
    stages.append(("neardup_dedup", s3))

    # -- 4. decontamination vs the holdout ---------------------------------
    # split_contamination(train=holdout, val=corpus) lists corpus docs
    # sharing >=1 k-gram with the eval set; anti-join them away. The gram
    # must be LONG for decontamination (GPT-3 used 13 word-piece grams;
    # char-5-grams would flag essentially every doc) — decontam_k chars,
    # independent of the near-dup shingle width.
    if holdout is not None:
        p4 = f"{out_base}/stage4_decontam"
        if not _done(p4):
            contam = split_contamination(holdout, s3, k=decontam_k).select("doc_id")
            s3.join(contam, "doc_id", "left_anti").write.mode(
                "overwrite"
            ).parquet(p4)
        s4 = _read(p4, base_schema)
    else:
        s4 = s3
    stages.append(("decontam", s4))

    # -- 5. domain cap + adaptive top-fraction gate -------------------------
    p5 = f"{out_base}/stage5_mixture"
    if not _done(p5):
        qscore = quality_columns(F.col("text"))["quality_score"]
        capped = source_quota_cap(s4, qscore, k=source_cap).drop("quota_rank")
        gated = top_fraction_per_stratum(capped, qscore, keep_frac).drop(
            "stratum_rank"
        )
        gated.write.mode("overwrite").parquet(p5)
    s5 = _read(p5, base_schema)
    stages.append(("mixture", s5))

    # -- 6. curated corpus + dataset card -----------------------------------
    p6 = f"{out_base}/curated"
    if not _done(p6):
        s5.write.mode("overwrite").partitionBy("source").parquet(p6)
    card = (
        s5.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("source")
    )
    card.write.mode("overwrite").parquet(f"{out_base}/dataset_card")
    return _read(p6, base_schema), stages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--holdout", default=None)
    ap.add_argument("--source-cap", type=int, default=100_000)
    ap.add_argument("--keep-frac", type=float, default=0.5)
    ap.add_argument("--index-dir", default=None,
                    help="shared digest index (cross-run incremental dedup)")
    ap.add_argument("--classifier-ref", default=None,
                    help="parquet of reference (positive-class) docs; enables "
                         "the trained NB filter stage")
    args = ap.parse_args()

    from nginx_log_spark.session import get_spark

    spark = get_spark(app="nginx_log_spark-curation")
    docs = spark.read.parquet(args.input)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    ref = spark.read.parquet(args.classifier_ref) if args.classifier_ref else None
    curated, stages = run_curation(
        spark, docs, args.output,
        holdout=holdout, source_cap=args.source_cap, keep_frac=args.keep_frac,
        index_dir=args.index_dir, classifier_ref=ref,
    )
    for name, df in stages:
        print(f"[curation] {name}: {df.count()} docs")
    print(f"[curation] curated: {curated.count()} docs -> {args.output}/curated")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
