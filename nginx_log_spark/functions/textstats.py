"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, fingerprinting.

All pure JVM expressions (split/transform/filter/md5 — whole-stage codegen,
no Python), so they run at scan speed over 100 TB of documents and are
oracle-checkable against equivalent ANSI SQL in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_cols(text: Column) -> dict[str, Column]:
    """whitespace token count + BPE-ish regex token count."""
    trimmed = F.trim(text)
    ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return {"n_ws_tokens": ws.cast("int"), "n_bpe_tokens": bpe.cast("int")}


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "this", "was", "are", "be", "at",
]
_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}\-]"


def quality_columns(text: Column) -> dict[str, Column]:
    """length / punct-ratio / stopword-ratio / mean-word-length features and
    a composite score in [0, 1] (higher = more natural-language-like)."""
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n_words = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(words))
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(F.lit(0.0))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2
    )
    return {
        "n_chars": n_chars.cast("int"),
        "n_words": n_words.cast("int"),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "mean_word_len": F.round(mean_wlen, 6),
        "quality_score": F.round(score, 6),
    }


# ---------------------------------------------------------------------------
# language ID: deterministic first-match heuristic (n-gram/stopword based)
# ---------------------------------------------------------------------------

_LANG_RULES: list[tuple[str, str]] = [
    # CJK codepoints => zh
    (r"[一-鿿]", "zh"),
    # German function words
    (r"(?i)(^|\s)(der|die|das|und|nicht|ein|ist|ich|mit|für)(\s|$)", "de"),
    # French
    (r"(?i)(^|\s)(le|la|les|est|et|une|dans|pour|que|vous)(\s|$)", "fr"),
    # Spanish
    (r"(?i)(^|\s)(el|los|las|es|y|una|para|con|por|usted)(\s|$)", "es"),
    # English
    (r"(?i)(^|\s)(the|and|is|of|to|in|that|it|for|with)(\s|$)", "en"),
]


def lang_id_col(text: Column) -> Column:
    """First-match language heuristic -> 'zh'/'de'/'fr'/'es'/'en'/'und'."""
    expr: Column | None = None
    for pattern, lang in _LANG_RULES:
        cond = text.rlike(pattern)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    assert expr is not None
    return expr.otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# curation gate: compose the signals into a route verdict
# ---------------------------------------------------------------------------


def quality_route(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_words: int = 20,
    min_score: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    max_dup_frac: float = 0.3,
    rep_k: int = 8,
) -> DataFrame:
    """Training-data curation gate: first-failing-reason verdict per doc.

    Composes the quality/langid/repetition signals into the filter a
    curation pipeline actually routes on: reason = too_short | low_quality |
    non_target_lang | too_repetitive (checked in that fixed order) | ok.
    Pure projection — every signal is a JVM expression over the text column,
    so the gate runs at scan speed with no shuffle; feed the result to a
    partitioned fan-out write (route/) or a (source, reason) rollup for
    per-shard accounting.
    """
    q = quality_columns(F.col(text_col))
    # dup-gram fraction, same rule as dedup.repetition_stats: project the
    # normalized text FIRST so the transform lambda doesn't re-run the
    # normalization regex once per array element
    staged = df.withColumn(
        "_nrm", F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    ).withColumn("_total", F.greatest(F.length("_nrm") - (rep_k - 1), F.lit(0)))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_nrm) - {rep_k - 1}, 1)), "
        f"i -> substring(_nrm, i, {rep_k}))"
    )
    dup_frac = F.when(
        F.col("_total") > 0,
        (F.col("_total") - F.size(F.array_distinct(grams))) / F.col("_total"),
    ).otherwise(F.lit(0.0))
    reason = (
        F.when(q["n_words"] < min_words, F.lit("too_short"))
        .when(q["quality_score"] < min_score, F.lit("low_quality"))
        .when(~lang_id_col(F.col(text_col)).isin(*langs), F.lit("non_target_lang"))
        .when(F.round(dup_frac, 6) > max_dup_frac, F.lit("too_repetitive"))
        .otherwise(F.lit("ok"))
    )
    return staged.select(
        F.col(id_col),
        F.col(source_col),
        reason.alias("reason"),
        (reason == "ok").alias("kept"),
    )


# ---------------------------------------------------------------------------
# paragraph/sentence-level duplication (C4-style span dedup signal)
# ---------------------------------------------------------------------------


def _span_instances(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str,
    min_chars: int,
    word_window: int | None,
) -> DataFrame:
    """(id, _idx, _span, _h) — one row per span instance, position-indexed.

    Two span definitions share all downstream machinery: sentence mode
    (split on ``sep``, trim, drop spans under ``min_chars``) and word-
    window mode (non-overlapping blocks of ``word_window`` whitespace
    words — the fixed-width variant for corpora without sentence
    punctuation; ``min_chars`` is not applied there, the tiling IS the
    span rule). The word array is PROJECTED once before the per-window
    transform — the slice lambda reuses it, so work stays O(len), never
    O(len^2) regex (the repo's with_shingles discipline).
    """
    nrm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    if word_window is not None:
        pre = df.select(F.col(id_col), F.split(nrm, " ").alias("_ws"))
        spans = F.expr(
            f"transform(sequence(0, size(_ws) - 1, {int(word_window)}), "
            f"i -> array_join(slice(_ws, i + 1, {int(word_window)}), ' '))"
        )
        ex = pre.select(F.col(id_col), F.posexplode(spans).alias("_idx", "_span"))
    else:
        spans = F.filter(
            F.transform(F.split(nrm, sep), lambda s: F.trim(s)),
            lambda s: F.length(s) >= min_chars,
        )
        ex = df.select(F.col(id_col), F.posexplode(spans).alias("_idx", "_span"))
    return ex.withColumn("_h", F.md5("_span"))


def paragraph_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\.\s+",
    min_chars: int = 20,
    word_window: int | None = None,
) -> DataFrame:
    """Corpus-level span duplication per doc: split each doc into
    normalized spans (sentences/paragraphs by ``sep``, or fixed
    ``word_window``-word blocks — see _span_instances), count every span's
    occurrences ACROSS the corpus, and report per doc how many of its
    spans appear elsewhere — the C4-style signal for boilerplate shared
    between documents (exact n-gram repetition within one doc is
    repetition_stats; this is the cross-document twin).

    Returns (id, n_spans, n_dup_spans, dup_span_frac).

    Scale shape: explode volume = text volume (one pass); the global count
    groups on md5(span) — uniform 128-bit keys, map-side combined — and
    the join back keys on the same digest. No self-join, no skewed keys.
    """
    ex = _span_instances(df, text_col, id_col, sep, min_chars, word_window)
    counts = ex.groupBy("_h").agg(F.count(F.lit(1)).alias("_n"))
    per_doc = (
        ex.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("_n") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    # docs with no qualifying span still get a row (frac 0)
    base = df.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.round(
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.coalesce("n_dup_spans", F.lit(0))
                / F.coalesce("n_spans", F.lit(1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_span_frac"),
    )
    return out



def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\.\s+",
    min_chars: int = 20,
    word_window: int | None = None,
) -> DataFrame:
    """C4-style boilerplate REMOVAL (Raffel et al. 2020, the §2.2 "three-
    sentence span" rule, public): rebuild each document keeping only one
    corpus-wide occurrence of every duplicated span. paragraph_dup_stats
    is the detector; this is the transform. A span instance survives when
    its span is corpus-unique OR it is the canonical first occurrence
    (min (doc_id, position) — deterministic, engine-independent).

    Returns (id, n_kept_spans, n_removed_spans, cleaned_fp) where
    cleaned_fp = md5 of the rebuilt normalized text (kept spans joined by
    '. ' in original order) — the value a downstream writer would emit,
    fingerprinted so the whole rebuild is oracle-checkable.

    Scale shape: one posexplode (volume = text volume), one uniform
    md5-keyed groupBy computing count AND canonical occurrence together,
    one digest-keyed join back, one per-doc agg — the same shuffle budget
    as the detector; no self-join, no skew. The collect_list is per-doc
    (bounded by doc length), never per-key.
    """
    ex = _span_instances(df, text_col, id_col, sep, min_chars, word_window)
    agg = ex.groupBy("_h").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_idx").alias("i"))).alias("_first"),
    )
    kept = ex.join(agg, "_h").filter(
        (F.col("_n") == 1)
        | ((F.col("_first.d") == F.col(id_col)) & (F.col("_first.i") == F.col("_idx")))
    )
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept_spans"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_idx"), F.col("_span")))
                    ),
                    lambda s: s["_span"],
                ),
                " " if word_window is not None else ". ",
            )
        ).alias("cleaned_fp"),
    )
    totals = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_spans"))
    base = df.select(F.col(id_col))
    return (
        base.join(totals, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_kept_spans", F.lit(0)).cast("long").alias("n_kept_spans"),
            (
                F.coalesce("_n_spans", F.lit(0)) - F.coalesce("n_kept_spans", F.lit(0))
            ).cast("long").alias("n_removed_spans"),
            F.coalesce("cleaned_fp", F.md5(F.lit(""))).alias("cleaned_fp"),
        )
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def doc_fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def winnow_fingerprints(df: DataFrame, text_col: str = "text", k: int = 8, keep: int = 4) -> DataFrame:
    """Winnowing-style k-gram fingerprints: hash every k-char gram, keep the
    ``keep`` smallest hashes per doc (a robust near-dup sketch). All native:
    sequence -> transform(substring) -> md5 -> array_sort -> slice.

    The normalized text is projected ONCE (`_wnrm`) before the per-gram
    lambda — inlining the regex inside the transform would re-run it per
    array element, O(len^2) regex work per doc (the with_shingles rule)."""
    # dynamic-start substring needs SQL expr (the DSL substring takes literals)
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_wnrm) - {k} + 1, 1)), "
        f"i -> md5(substring(_wnrm, i, {k})))"
    )
    return (
        df.withColumn("_wnrm", F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        .withColumn("fingerprints", F.slice(F.array_sort(grams), 1, keep))
        .drop("_wnrm")
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): no lookaround, no backrefs. Redaction
# applies them IN THIS ORDER (email first so its host part can't later be
# half-eaten by the ipv4 rule on pathological inputs).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{6,13}\d", "<PHONE>"),
]


def pii_columns(text: Column) -> dict[str, Column]:
    """Per-pattern match counts (on the ORIGINAL text, each pattern
    independently) plus the fully redacted text. Pure JVM regex — scan
    speed, no shuffle; a 100 TB scrub is exactly this projection feeding a
    partitioned rewrite."""
    out: dict[str, Column] = {}
    redacted = text
    for name, pat, repl in PII_RULES:
        out[f"n_{name}"] = F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("int")
        redacted = F.regexp_replace(redacted, pat, repl)
    out["redacted"] = redacted
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII from ``text_col`` in place and append per-pattern counts
    (n_email, n_ipv4, n_phone). The redacted text replaces the original
    column, so downstream operators (dedup, packing, routing) compose
    unchanged."""
    cols = pii_columns(F.col(text_col))
    out = df
    for name, _, _ in PII_RULES:
        out = out.withColumn(f"n_{name}", cols[f"n_{name}"])
    return out.withColumn(text_col, cols["redacted"])


# ---------------------------------------------------------------------------
# corpus unigram LM scoring (CCNet-style perplexity-proxy quality filter)
# ---------------------------------------------------------------------------


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 65536,
) -> DataFrame:
    """Per-doc mean negative log-likelihood under the corpus's OWN unigram
    distribution — the cheap stand-in for CCNet's KenLM perplexity filter
    (high NLL = out-of-distribution / junk, low NLL = stereotyped).

    Determinism discipline (the repo's integer-sum FP rule): each vocab
    word's log-prob is fixed-pointed ONCE to a BIGINT (round(ln(p)*1e6)),
    per-doc totals are exact integer sums — so the result is independent of
    partitioning / summation order, and byte-identical to the DuckDB twin.

    Scale shape at 100 TB: the vocab build is one explode + groupBy on
    word (map-side combined, output <= |vocab|); the cap to ``top_v`` makes
    the score-side join broadcastable (everything outside the cap scores as
    OOV at the floor prob 1/total, exactly what a fixed-vocab LM does);
    the fact table then aggregates by doc with uniform keys. No sort, no
    skew: word frequencies are Zipfian but the join side is broadcast so
    hot words never shuffle.
    """
    nrm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = df.select(
        F.col(id_col), F.explode(F.split(nrm, " ")).alias("word")
    ).filter(F.length("word") > 0)

    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total_df = counts.agg(F.sum("cnt").alias("total"))
    vocab = (
        counts.crossJoin(F.broadcast(total_df))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_v)
        .select(
            "word",
            F.round(F.log(F.col("cnt") / F.col("total")) * 1e6)
            .cast("long")
            .alias("lp_e6"),
        )
    )
    floor_lp = (
        total_df.select(
            F.round(F.log(F.lit(1.0) / F.col("total")) * 1e6)
            .cast("long")
            .alias("floor_lp_e6")
        )
    )
    scored = (
        words.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(floor_lp))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.col("lp_e6").isNull().cast("long")).alias("n_oov"),
            F.sum(F.coalesce("lp_e6", "floor_lp_e6")).alias("sum_lp_e6"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        F.coalesce("sum_lp_e6", F.lit(0)).cast("long").alias("sum_lp_e6"),
        F.when(
            F.coalesce("n_words", F.lit(0)) > 0,
            F.round(-F.col("sum_lp_e6") / F.col("n_words")).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("avg_nll_e6"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 1 << 20,
) -> DataFrame:
    """Per-doc mean negative log-likelihood under a corpus bigram model —
    one rung up the CCNet ladder from unigram_logprob_score, same
    determinism discipline (per-bigram log-probs fixed-pointed to BIGINT
    once, per-doc totals exact integer sums).

    P(w2|w1) = c(w1 w2) / c(w1 ·), both counts derived from the SAME
    bigram table (c(w1 ·) = bigrams starting with w1), so the model is
    self-consistent at document boundaries. Bigrams outside the top_v cap
    score at the corpus floor 1/B (B = total bigram occurrences) — the
    fixed-vocab OOV rule.

    Scale shape: bigram extraction is a JVM zip_with over the word array
    (no Python, no extra scan); the count table is one groupBy on the pair
    string (map-side combined, <= |V|^2 keys but Zipf-concentrated);
    the score-side join is broadcast under the cap. The fact table never
    shuffles except the final by-doc aggregation on uniform ids.
    """
    nrm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    ws = F.filter(F.split(nrm, " "), lambda w: F.length(w) > 0)
    staged = df.select(F.col(id_col), ws.alias("_ws"))
    pairs_arr = F.when(
        F.size("_ws") >= 2,
        F.zip_with(
            F.slice("_ws", 1, F.size("_ws") - 1),
            F.slice("_ws", 2, F.size("_ws") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = staged.select(
        F.col(id_col), F.explode(pairs_arr).alias("pair")
    ).withColumn("w1", F.split(F.col("pair"), " ")[0])

    c12 = pairs.groupBy("pair", "w1").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    total_df = c12.agg(F.sum("c12").alias("total"))
    vocab = (
        c12.join(c1, "w1")
        .orderBy(F.desc("c12"), F.asc("pair"))
        .limit(top_v)
        .select(
            "pair",
            F.round(F.log(F.col("c12") / F.col("c1")) * 1e6)
            .cast("long")
            .alias("blp_e6"),
        )
    )
    floor_lp = total_df.select(
        F.round(F.log(F.lit(1.0) / F.col("total")) * 1e6)
        .cast("long")
        .alias("floor_blp_e6")
    )
    scored = (
        pairs.join(F.broadcast(vocab), "pair", "left")
        .crossJoin(F.broadcast(floor_lp))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce("blp_e6", "floor_blp_e6")).alias("sum_blp_e6"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("sum_blp_e6", F.lit(0)).cast("long").alias("sum_blp_e6"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.round(-F.col("sum_blp_e6") / F.col("n_bigrams")).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("avg_bnll_e6"),
    )


# ln(0.4) fixed-pointed once — the stupid-backoff discount (Brants et al.
# 2007, "Large Language Models in Machine Translation"): backoff chains add
# this integer, so combined scores stay exact-integer and order-independent
BACKOFF_ALPHA_E6 = -916291  # round(ln(0.4) * 1e6)


def trigram_backoff_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_t: int = 1 << 20,
    top_b: int = 1 << 20,
    top_v: int = 65536,
) -> DataFrame:
    """Per-doc mean negative log-likelihood under a corpus trigram model
    with STUPID BACKOFF — the top rung of the repo's CCNet-ladder LM family
    (unigram -> bigram -> trigram+backoff), same determinism discipline:
    every model log-prob is fixed-pointed ONCE to BIGINT, backoff chains
    are integer additions of BACKOFF_ALPHA_E6, per-doc totals are exact
    integer sums — independent of partitioning and summation order.

    Score of trigram (w1 w2 w3):
        S = ln(c3(w1w2w3) / c2(w1w2))           if the trigram is in-model
          | a + ln(c2(w2w3) / c2(w2 .))         elif the bigram is in-model
          | 2a + ln(c1(w3) / N)                 elif w3 is in-vocab
          | 2a + ln(1 / N)                      else (OOV floor)
    with a = ln(0.4). In-model = inside the top_t/top_b/top_v frequency
    caps (ties broken by key asc) — the caps ARE the fixed model size, so
    backoff actually fires (a self-scored uncapped corpus model would
    never back off), and they keep every score-side join broadcastable.

    Scale shape at 100 TB: three count tables (tri/bi/uni) are exploded
    groupBys with map-side combine, outputs bounded by the caps after
    top-K; the trigram fact then takes three BROADCAST hash joins + one
    by-doc aggregation on uniform ids. No skew: Zipf-hot grams live on the
    broadcast side. Nothing but the final groupBy shuffles the fact.
    """
    nrm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    ws = F.filter(F.split(nrm, " "), lambda w: F.length(w) > 0)
    staged = df.select(F.col(id_col), ws.alias("_ws"))

    # corpus facts: unigrams, bigrams (positions 1..n-1), trigrams (1..n-2)
    words = staged.select(F.col(id_col), F.explode("_ws").alias("word"))
    pair_arr = F.when(
        F.size("_ws") >= 2,
        F.zip_with(
            F.slice("_ws", 1, F.size("_ws") - 1),
            F.slice("_ws", 2, F.size("_ws") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = staged.select(F.col(id_col), F.explode(pair_arr).alias("pair"))
    tri_arr = F.when(
        F.size("_ws") >= 3,
        F.zip_with(
            F.slice("_ws", 1, F.size("_ws") - 2),
            F.zip_with(
                F.slice("_ws", 2, F.size("_ws") - 2),
                F.slice("_ws", 3, F.size("_ws") - 2),
                lambda b, c: F.concat(b, F.lit(" "), c),
            ),
            lambda a, bc: F.concat(a, F.lit(" "), bc),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tris = staged.select(F.col(id_col), F.explode(tri_arr).alias("tri"))

    # model tables (each capped, fixed-pointed once)
    wcnt = words.groupBy("word").agg(F.count(F.lit(1)).alias("c1"))
    wtot = wcnt.agg(F.sum("c1").alias("total"))
    uv = (
        wcnt.crossJoin(F.broadcast(wtot))
        .orderBy(F.desc("c1"), F.asc("word"))
        .limit(top_v)
        .select(
            F.col("word").alias("w3"),
            F.round(F.log(F.col("c1") / F.col("total")) * 1e6).cast("long").alias("ulp_e6"),
        )
    )
    floor_lp = wtot.select(
        F.round(F.log(F.lit(1.0) / F.col("total")) * 1e6).cast("long").alias("floor_ulp_e6")
    )

    pcnt = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("c12"))
    p_w1 = pairs.select(F.split(F.col("pair"), " ")[0].alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).alias("cw1")
    )
    bv = (
        pcnt.withColumn("w1", F.split(F.col("pair"), " ")[0])
        .join(p_w1, "w1")
        .orderBy(F.desc("c12"), F.asc("pair"))
        .limit(top_b)
        .select(
            F.col("pair").alias("p23"),
            F.round(F.log(F.col("c12") / F.col("cw1")) * 1e6).cast("long").alias("blp_e6"),
        )
    )

    tcnt = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("c3"))
    tv = (
        tcnt.withColumn(
            "p12",
            F.concat(F.split(F.col("tri"), " ")[0], F.lit(" "), F.split(F.col("tri"), " ")[1]),
        )
        .join(pcnt.select(F.col("pair").alias("p12"), "c12"), "p12")
        .orderBy(F.desc("c3"), F.asc("tri"))
        .limit(top_t)
        .select(
            "tri",
            F.round(F.log(F.col("c3") / F.col("c12")) * 1e6).cast("long").alias("tlp_e6"),
        )
    )

    # score-side: three broadcast joins over the trigram fact
    a = F.lit(BACKOFF_ALPHA_E6)
    fact = (
        tris.withColumn("_w", F.split(F.col("tri"), " "))
        .withColumn("p23", F.concat(F.col("_w")[1], F.lit(" "), F.col("_w")[2]))
        .withColumn("w3", F.col("_w")[2])
        .join(F.broadcast(tv), "tri", "left")
        .join(F.broadcast(bv), "p23", "left")
        .join(F.broadcast(uv), "w3", "left")
        .crossJoin(F.broadcast(floor_lp))
        .withColumn(
            "lp_e6",
            F.coalesce(
                F.col("tlp_e6"),
                a + F.col("blp_e6"),
                a + a + F.coalesce(F.col("ulp_e6"), F.col("floor_ulp_e6")),
            ),
        )
    )
    scored = fact.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum((F.col("tlp_e6").isNull() & F.col("blp_e6").isNotNull()).cast("long")).alias("n_bo_bi"),
        F.sum((F.col("tlp_e6").isNull() & F.col("blp_e6").isNull()).cast("long")).alias("n_bo_uni"),
        F.sum("lp_e6").alias("sum_tlp_e6"),
    )
    base = df.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce("n_bo_bi", F.lit(0)).cast("long").alias("n_bo_bi"),
        F.coalesce("n_bo_uni", F.lit(0)).cast("long").alias("n_bo_uni"),
        F.coalesce("sum_tlp_e6", F.lit(0)).cast("long").alias("sum_tlp_e6"),
        F.when(
            F.coalesce("n_trigrams", F.lit(0)) > 0,
            F.round(-F.col("sum_tlp_e6") / F.col("n_trigrams")).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("avg_tnll_e6"),
    )
