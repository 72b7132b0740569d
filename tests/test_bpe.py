"""BPE learn/apply (functions/bpe.py).

Evidence strategy (no DuckDB oracle — iterative per-word fixpoint is not
SQL-expressible): apply_bpe is pinned against an INDEPENDENT reference
implementation (replay merges in creation order, the textbook-equivalent
formulation of the lowest-rank-first loop), learn_bpe against
hand-computable merges on a known corpus, plus lossless-ness and
determinism properties on the documents table.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.functions.bpe import (
    PRETOKEN_PATTERN,
    apply_bpe,
    encode_word,
    learn_bpe,
)


def ref_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent oracle: apply each merge in CREATION ORDER, fusing all
    its occurrences, one merge at a time (Sennrich's original replay
    formulation — provably equivalent to lowest-rank-first)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_tokenize(text: str, merges: list[tuple[str, str]]) -> list[str]:
    toks = []
    for w in re.findall(PRETOKEN_PATTERN, text):
        if w and w != " ":
            toks.extend(ref_encode_word(w, merges))
    return toks


def test_learn_known_corpus(spark):
    # classic toy corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    merges = learn_bpe(df, n_merges=4, max_words=None)
    # counts: es=9 (newest+widest), st=9, lo=7 ... tiebreak min pair: ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")  # 'es'+'t' = 9, the new max
    # after est: lo=7 is next (l,o in low/lower; ties resolved by count)
    assert merges[2] == ("l", "o")
    assert len(merges) == 4


def test_encode_word_matches_replay_reference():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("n", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["newest", "lowest", "low", "wildest", "x", "", "stest", "estest"]:
        assert encode_word(w, ranks) == ref_encode_word(w, merges)


def test_apply_bpe_matches_reference_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    merges = learn_bpe(docs, n_merges=40)
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe(docs, merges).collect()
    }
    exp = {
        r["doc_id"]: ref_tokenize(r["text"], merges)
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == exp
    assert len(got) == 120


def test_apply_bpe_lossless(spark):
    """Concatenating a word's tokens reproduces the word: BPE merges never
    add/drop characters, so detokenization is exact."""
    texts = [
        ("a", "the quick brown fox, 1234 times!"),
        ("b", "aaaa bbbb aaaa"),
        ("c", ""),
        ("d", "  leading and   multiple spaces "),
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    merges = learn_bpe(df, n_merges=10, max_words=None)
    for r in apply_bpe(df, merges).collect():
        text = dict(texts)[r["doc_id"]]
        pretoks = [w for w in re.findall(PRETOKEN_PATTERN, text) if w and w != " "]
        assert "".join(r["bpe_tokens"]) == "".join(pretoks)
        assert r["n_bpe_real"] == len(r["bpe_tokens"])


def test_learn_deterministic_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    m1 = learn_bpe(docs.repartition(1), n_merges=15)
    m8 = learn_bpe(docs.repartition(8), n_merges=15)
    assert m1 == m8


def test_max_words_cap_bounds_driver_state(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    # a tight cap still learns (on the head of the Zipf histogram)
    merges = learn_bpe(docs, n_merges=5, max_words=50)
    assert len(merges) == 5


def test_distributed_learn_matches_driver_loop(spark, sf_dir):
    """learn_bpe_distributed (per-round JVM pair-count groupBy + argmax +
    aggregate()-fold fuse; histogram never on the driver) must produce
    EXACTLY learn_bpe's merge list: toy corpus uncapped, real documents
    capped (the cap path shares the same deterministic top-K), and the
    exhausted-corpus early stop."""
    from nginx_log_spark.functions.bpe import learn_bpe_distributed

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    toy = spark.createDataFrame([(" ".join(words),)], "text string")
    assert learn_bpe_distributed(toy, n_merges=8) == learn_bpe(
        toy, n_merges=8, max_words=None
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    assert learn_bpe_distributed(
        docs, n_merges=12, max_words=200, checkpoint_every=4
    ) == learn_bpe(docs, n_merges=12, max_words=200)

    ex = spark.createDataFrame([("ab ab",)], "text string")
    assert learn_bpe_distributed(ex, n_merges=10) == [("a", "b"), (" ", "ab")]


def test_fewer_merges_than_requested_when_exhausted(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    # pretokens: "ab", " ab" (Ġ convention keeps the leading space):
    # ('a','b') x2, then (' ','ab') x1, then nothing — 2 merges, not 10
    merges = learn_bpe(df, n_merges=10, max_words=None)
    assert merges == [("a", "b"), (" ", "ab")]
