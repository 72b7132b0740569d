"""End-to-end curation recipe (jobs/run_curation.py): the chained
dedup -> gate -> near-dup -> decontam -> mixture pipeline, its stage-level
resume, and the cross-run incremental property of the shared digest index.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "jobs"))

from run_curation import run_curation  # noqa: E402

GATE = dict(min_words=3, min_score=0.0, langs=("en",), max_dup_frac=0.95)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )


def test_curation_chain_shrinks_monotonically(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    holdout = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    curated, stages = run_curation(
        spark, corpus, str(tmp_path / "cur"),
        holdout=holdout, source_cap=20, keep_frac=0.8, gate_kwargs=GATE,
    )
    counts = {name: df.count() for name, df in stages}
    n0 = corpus.count()
    order = ["exact_dedup", "quality_gate", "neardup_dedup", "decontam", "mixture"]
    prev = n0
    for name in order:
        assert counts[name] <= prev, (name, counts, n0)
        prev = counts[name]
    assert curated.count() == counts["mixture"] > 0
    # the dataset card accounts for exactly the curated rows
    card = spark.read.parquet(str(tmp_path / "cur" / "dataset_card")).toPandas()
    assert card.n_docs.sum() == counts["mixture"]
    # near-dup stage really dropped something on this fixture (476/500
    # survive plain exact dedup, the LSH chain removes the near-dups)
    assert counts["neardup_dedup"] < counts["quality_gate"]


def test_curation_resume_skips_completed_stages(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).limit(200)
    base = str(tmp_path / "cur2")
    c1, s1 = run_curation(
        spark, docs, base, source_cap=20, keep_frac=0.8, gate_kwargs=GATE
    )
    first = sorted(r.doc_id for r in c1.select("doc_id").collect())
    # stage outputs carry _SUCCESS markers; a re-run recomputes nothing
    # and converges to the same curated set
    import time

    mtime_before = (Path(base) / "stage3_neardup" / "_SUCCESS").stat().st_mtime
    time.sleep(1.1)
    c2, _ = run_curation(
        spark, docs, base, source_cap=20, keep_frac=0.8, gate_kwargs=GATE
    )
    assert (Path(base) / "stage3_neardup" / "_SUCCESS").stat().st_mtime == mtime_before
    assert sorted(r.doc_id for r in c2.select("doc_id").collect()) == first


def test_curation_shared_index_makes_reingest_a_noop(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).limit(150)
    idx = str(tmp_path / "shared_idx")
    _, s1 = run_curation(
        spark, docs, str(tmp_path / "runA"), gate_kwargs=GATE, index_dir=idx
    )
    assert dict(s1)["exact_dedup"].count() > 0
    # the SAME batch ingested again against the shared index keeps nothing
    _, s2 = run_curation(
        spark, docs, str(tmp_path / "runB"), gate_kwargs=GATE, index_dir=idx
    )
    assert dict(s2)["exact_dedup"].count() == 0


def test_curation_trained_filter_stage(spark, sf_dir, tmp_path):
    # reference corpus = docs with a planted marker vocabulary; the NB
    # stage should keep marker-bearing crawl docs and drop the rest
    docs = _docs(spark, sf_dir).limit(120)
    marked = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" refmark refmark refmark refmark"))
    )
    corpus = marked.unionAll(docs.filter(F.col("doc_id") % 2 != 0))
    ref = marked.limit(30).select("text")
    curated, stages = run_curation(
        spark, corpus, str(tmp_path / "cur3"),
        source_cap=1000, keep_frac=1.0, gate_kwargs=GATE,
        classifier_ref=ref, classifier_neg_rate=0.4,
    )
    st = dict(stages)
    kept = st["trained_filter"].select("doc_id").toPandas().doc_id
    assert len(kept) > 0
    assert set(kept % 2) == {0}  # only marker (reference-like) docs survive
    assert st["trained_filter"].count() <= st["quality_gate"].count()
    # resume: the classifier stage is skipped on re-run
    mtime = (Path(str(tmp_path / "cur3")) / "stage2b_classifier" / "_SUCCESS").stat().st_mtime
    c2, _ = run_curation(
        spark, corpus, str(tmp_path / "cur3"),
        source_cap=1000, keep_frac=1.0, gate_kwargs=GATE,
        classifier_ref=ref, classifier_neg_rate=0.4,
    )
    assert (Path(str(tmp_path / "cur3")) / "stage2b_classifier" / "_SUCCESS").stat().st_mtime == mtime
