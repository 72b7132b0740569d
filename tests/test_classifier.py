"""Trained NB classifier (functions/classifier): learning, determinism,
fallbacks, and model shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from nginx_log_spark.functions import nb_fit, nb_score, portable_bucket


def _corpus(spark, n=120):
    """Two classes with a planted vocabulary difference: class 'tech' draws
    marker words, class 'chat' draws different ones, both share filler —
    deterministic, so accuracy numbers are constants."""
    rows = []
    tech = ["kernel", "compile", "buffer", "socket"]
    chat = ["hello", "thanks", "weekend", "coffee"]
    filler = ["the", "a", "and", "of"]
    for i in range(n):
        label = "tech" if i % 2 == 0 else "chat"
        src = tech if label == "tech" else chat
        words = []
        for j in range(30):
            words.append(src[(i * 7 + j) % 4] if j % 3 else filler[(i + j) % 4])
        rows.append((i, " ".join(words), label))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_learns_planted_signal_on_heldout(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") % 3 != 0)
    test = docs.filter(F.col("doc_id") % 3 == 0)
    model, priors = nb_fit(train, label_col="label", dims=256)
    got = nb_score(test, model, priors, dims=256).join(
        test.select("doc_id", "label"), "doc_id"
    )
    n = got.count()
    acc = got.filter(F.col("nb_pred") == F.col("label")).count() / n
    assert n == 40
    assert acc == 1.0  # fully separable by construction


def test_nb_model_is_dense_and_broadcastable(spark):
    docs = _corpus(spark, n=20)
    model, priors = nb_fit(docs, label_col="label", dims=64)
    rows = model.collect()
    assert len(rows) == 2 * 64  # exactly |labels| x dims, unseen = floor
    assert priors.count() == 2
    floor = min(r.llp_e6 for r in rows)
    assert all(r.llp_e6 <= 0 for r in rows)
    # unseen buckets exist in this tiny corpus and carry the worst log-prob
    per_label_floor = {}
    for r in rows:
        per_label_floor.setdefault(r.label, []).append(r.llp_e6)
    assert floor == min(min(v) for v in per_label_floor.values())


def test_nb_empty_doc_scores_prior_argmax(spark):
    docs = _corpus(spark, n=30)
    weird = docs.unionAll(
        spark.createDataFrame(
            [(1000, "   ", "tech"), (1001, "", "chat"), (1002, None, "tech")],
            "doc_id long, text string, label string",
        )
    )
    model, priors = nb_fit(docs, label_col="label", dims=64)
    got = {
        r.doc_id: r
        for r in nb_score(weird, model, priors, dims=64).collect()
    }
    pri = {r.label: r.prior_e6 for r in priors.collect()}
    best = max(sorted(pri), key=lambda k: pri[k])
    # NULL text behaves exactly like empty text: still one row, prior argmax
    for did in (1000, 1001, 1002):
        assert got[did].nb_pred == best
        assert got[did].nb_score_e6 == pri[best]
    assert len(got) == 33


def test_nb_tie_breaks_label_asc(spark):
    # two labels with mirror-image corpora: scoring a doc containing only
    # shared-frequency structure yields equal posteriors -> label asc wins
    rows = [(0, "x x", "b"), (1, "x x", "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    model, priors = nb_fit(docs, label_col="label", dims=16)
    got = nb_score(
        spark.createDataFrame([(9, "x")], "doc_id long, text string"),
        model, priors, dims=16,
    ).collect()[0]
    assert got.nb_pred == "a"
    assert got.nb_margin_e6 == 0


def test_portable_bucket_range(spark):
    df = spark.createDataFrame([(w,) for w in ["a", "b", "zz", "kernel"]], "w string")
    vals = [r.b for r in df.select(portable_bucket(F.col("w"), 7).alias("b")).collect()]
    assert all(0 <= v < 7 for v in vals)


def test_nb_score_plan_broadcasts_model(spark):
    docs = _corpus(spark, n=20)
    model, priors = nb_fit(docs, label_col="label", dims=64)
    plan = nb_score(docs, model, priors, dims=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row prior fallback
