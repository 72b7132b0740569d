"""Trained text classifier: multinomial Naive Bayes over hashing-trick
features, fit and scored as distributed DataFrame jobs.

This is the "quality/domain classifier" stage the GPT-3 / LLaMA / palm-style
curation recipes run between heuristic gates and dedup (Brown et al. 2020
§A; Touvron et al. 2023 §2): train a cheap linear classifier on labeled
reference text, score the whole crawl, keep/route by predicted class. The
repo's DSIR operator covers importance *weighting*; this adds the trained
*model* variant — explicit fit (sufficient statistics via one aggregation)
and apply (broadcast model join) phases, the shape any learned filter
(fasttext, logistic regression) takes at 10^12 docs.

Why Naive Bayes and not SGD: the fit is ONE groupBy over (label, feature)
token counts — exact, deterministic, order-independent, and expressible in
ANSI SQL, so the whole train+predict pipeline is value-checked against the
DuckDB oracle (the repo's correctness discipline) instead of being an
unverifiable float fit. The feature space is the hashing trick
(Weinberger et al. 2009) through the repo's portable md5 bucket, shared
with functions/similarity.hashed_tf.

Determinism discipline (the repo's integer-sum fixed-point rule, see
textstats.unigram_logprob_score): every per-(label, bucket) log-likelihood
and per-label log-prior is fixed-pointed ONCE to a BIGINT
(round(ln(p) * 1e6)); per-doc scores are exact integer sums of those,
so results are independent of partitioning / summation order and
byte-identical to the SQL twin.

Scale shape at 100 TB:
  - fit: explode (volume = token volume) -> map-side-combined groupBy on
    (label, bucket) whose output is <= |labels| x dims rows — the model is
    a few-thousand-row table no matter how big the corpus is, densified to
    exactly |labels| x dims rows (Laplace smoothing assigns unseen buckets
    their floor) so scoring needs no per-doc OOV bookkeeping.
  - score: explode -> per-doc tf (uniform keys) -> broadcast join with the
    dense model (fan-out x|labels|) -> two groupBys on uniform doc keys.
    The fact table never sort-shuffles; no skew (bucket fan-out is constant).

Reference parity note: the reference tool (suconghou/nginx_log) has no ML
surface — this module is part of the training-data extension mandated by
the round brief, same family as sampling.dsir_select.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nb_fit", "nb_score", "portable_bucket"]


def _norm_words(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """Whitespace tokens of the normalized text (the corpus-wide norm every
    text operator in this repo shares: lower, trim, collapse whitespace)."""
    # coalesce: NULL text must behave exactly like empty text (tokenizes
    # to nothing) so nb_score's every-doc-gets-a-row contract holds
    from nginx_log_spark.functions._parallel import ensure_parallelism

    nrm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "
    )
    # fan-out guard: a single-split corpus scan would otherwise run the
    # normalize+explode (the dominant cost of fit AND score) in one task
    return ensure_parallelism(df).select(
        *keep, F.explode(F.split(nrm, " ")).alias("word")
    ).filter(F.length("word") > 0)


def portable_bucket(col: Column, dims: int) -> Column:
    """First 8 hex chars of md5 -> [0, dims): identical expression exists
    in DuckDB as ``(('0x' || substr(md5(w), 1, 8))::BIGINT % d + d) % d``
    (similarity.hashed_tf uses the same mapping)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(dims)
    )


def nb_fit(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    dims: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with Laplace (+1) smoothing on hashed unigram
    counts. Returns ``(model, priors)``:

    - ``model``: exactly |labels| x dims rows ``(label, bucket, llp_e6)``
      with llp_e6 = round(ln((c + 1) / (tot_label + dims)) * 1e6) — dense,
      so unseen buckets carry their smoothing floor and the scorer needs no
      null handling.
    - ``priors``: |labels| rows ``(label, prior_e6)`` from document counts.

    Both outputs are broadcastable by construction; nothing about their
    size depends on corpus volume.
    """
    words = _norm_words(df, text_col, label_col)
    cnt = words.select(
        F.col(label_col).alias("label"),
        portable_bucket(F.col("word"), dims).alias("bucket"),
    ).groupBy("label", "bucket").agg(F.count(F.lit(1)).alias("c"))
    ltot = cnt.groupBy("label").agg(F.sum("c").alias("t"))
    grid = ltot.select(
        "label", "t", F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("bucket")
    )
    model = (
        grid.join(cnt, ["label", "bucket"], "left")
        .select(
            "label",
            "bucket",
            F.round(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0)) / (F.col("t") + F.lit(float(dims)))) * 1e6
            ).cast("long").alias("llp_e6"),
        )
    )
    ndocs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    priors = (
        ndocs.crossJoin(F.broadcast(ndocs.agg(F.sum("n").alias("nt"))))
        .select(
            "label",
            F.round(F.log(F.col("n") / F.col("nt")) * 1e6).cast("long").alias("prior_e6"),
        )
    )
    return model, priors


def nb_score(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 1024,
) -> DataFrame:
    """Score every doc under a fitted NB model: per-doc
    ``(id, nb_pred, nb_score_e6, nb_margin_e6)`` where nb_pred is the
    argmax label (ties broken label-asc), nb_score_e6 its exact integer
    posterior log-score, and nb_margin_e6 the gap to the runner-up (the
    filter threshold a curation pipeline routes on).

    Docs that tokenize to nothing still get a row: their score is the
    prior alone, computed from the same broadcast table — no driver
    action. Token-less is detected at scan speed (``trim(text) = ''`` is
    exactly "the normalizer emits no words"), so completeness costs a
    filtered scan + union, NOT a full doc-id join against the scored set.
    """
    tf = (
        _norm_words(df, text_col, id_col)
        .select(id_col, portable_bucket(F.col("word"), dims).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per_label = (
        tf.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("tf") * F.col("llp_e6")).alias("s_e6"))
        .join(F.broadcast(priors), "label")
        .select(id_col, "label", (F.col("s_e6") + F.col("prior_e6")).alias("score_e6"))
    )
    # top-2 per doc: |labels| is tiny, so a sorted collect_list beats a
    # window (no per-doc sort shuffle beyond the groupBy itself)
    ranked = per_label.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("score_e6")).alias("ns"), F.col("label")))
        ).alias("arr")
    )
    picked = ranked.select(
        id_col,
        F.col("arr")[0]["label"].alias("nb_pred"),
        (-F.col("arr")[0]["ns"]).alias("nb_score_e6"),
        F.when(F.size("arr") > 1, F.col("arr")[1]["ns"] - F.col("arr")[0]["ns"])
        .otherwise(F.lit(0)).cast("long").alias("nb_margin_e6"),
    )
    # prior-only fallback for token-less docs (1-row broadcast, no action)
    pri2 = (
        priors.agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col("prior_e6")).alias("ns"), F.col("label")))
            ).alias("arr")
        ).select(
            F.col("arr")[0]["label"].alias("_p_pred"),
            (-F.col("arr")[0]["ns"]).alias("_p_score_e6"),
            F.when(F.size("arr") > 1, F.col("arr")[1]["ns"] - F.col("arr")[0]["ns"])
            .otherwise(F.lit(0)).cast("long").alias("_p_margin_e6"),
        )
    )
    empty = (
        df.filter(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0)
        .select(id_col)
        .crossJoin(F.broadcast(pri2))
        .select(
            id_col,
            F.col("_p_pred").alias("nb_pred"),
            F.col("_p_score_e6").alias("nb_score_e6"),
            F.col("_p_margin_e6").alias("nb_margin_e6"),
        )
    )
    return picked.unionAll(empty)
