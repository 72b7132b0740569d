"""Byte-pair encoding: distributed training + Arrow-batched application.

The token-count operators (textstats.token_count_cols) approximate a BPE
tokenizer with a regex; this module is the real thing, the last mile of
the tokens story: LEARN a merge table from a corpus and APPLY it, both
as Spark jobs.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the GPT-2 variant pre-tokenizes with a regex
and merges within words only — word boundaries are never crossed):

  learn: repeat n_merges times:
    1. count adjacent symbol pairs across the corpus, weighted by word
       frequency (distributed: one groupBy over (pair) partials)
    2. pick the most frequent pair (deterministic tiebreak)
    3. fuse that pair everywhere it occurs
  apply: split each word into characters, repeatedly fuse the
    lowest-rank adjacent pair until no learned pair remains.

Scale shape
-----------
- learn compresses the corpus to its UNIQUE-WORD histogram first (one
  groupBy; Zipf makes this tiny relative to the corpus — exactly why
  reference BPE trainers operate on word counts, not running text).
  Two merge-round engines share that histogram, pinned to identical
  output:
  * learn_bpe — rounds run on the driver over the collected histogram,
    the standard single-process design (HuggingFace/SentencePiece);
    max_words caps driver memory deterministically, and rare-tail words
    contribute O(1) pair counts each, so real trainers subsample exactly
    this way. Contract: driver state is bounded by the cap, NOT by
    corpus size.
  * learn_bpe_distributed — every round is JVM-side Spark work (pair
    explode + groupBy argmax + aggregate()-fold fuse), the histogram
    never touches the driver: the scale path when an uncapped vocabulary
    must survive production 32k-50k merges.
- apply is embarrassingly parallel: mapInPandas over docs, merges
  broadcast once per executor (closure capture), per-batch word cache
  (Zipf again: the hot words' merge loops run once per BATCH, not once
  per occurrence).

Not SQL-expressible (iterative fixpoint per word), so evidence is
pytest: apply is pinned against an independent pure-Python reference
and learn against hand-computed merges on a known corpus
(tests/test_bpe.py); the SURVEY §2.10 row records why there is no
DuckDB oracle.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer, restricted to constructs with identical
# semantics in Java regex and Python re: words / numbers / single symbols,
# each with an optional leading space folded in (the Ġ convention).
PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]|\s"


def _pretokenize(text: str) -> list[str]:
    import re

    return [w for w in re.findall(PRETOKEN_PATTERN, text) if w and w != " "]


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference merge loop: fuse the LOWEST-RANK adjacent pair first
    (rank = merge-creation order), repeat to fixpoint. This exact loop is
    both the engine's per-word kernel and the test oracle's."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int | None = 200_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Spark does the data-sized step — the corpus-wide unique-word
    histogram (explode + groupBy; the ONLY pass over the full corpus) —
    then the merge rounds run over that histogram driver-side, as
    reference trainers do. ``max_words`` caps the histogram at the most
    frequent words (ties by word asc) so driver memory is bounded and
    deterministic at any corpus size.

    Tiebreak: max count, then lexicographic pair asc — fully
    deterministic for a given corpus.
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
            ).alias("w")
        )
        .filter((F.col("w") != "") & (F.col("w") != " "))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_words is not None:
        words = words.orderBy(F.desc("cnt"), F.asc("w")).limit(max_words)
    hist: dict[tuple[str, ...], int] = {
        # driver-sized by contract: <= max_words histogram rows (the cap is
        # the documented bound; learn_bpe_distributed is the uncapped path)
        _word_symbols(r["w"]): int(r["cnt"]) for r in words.collect()
    }

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, cnt in hist.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += cnt
        if not pair_counts:
            break
        top_cnt = max(pair_counts.values())
        pair = min(p for p, c in pair_counts.items() if c == top_cnt)
        merges.append(pair)
        fused = pair[0] + pair[1]
        new_hist: dict[tuple[str, ...], int] = {}
        for syms, cnt in hist.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_hist[k] = new_hist.get(k, 0) + cnt
        hist = new_hist
    return merges


def learn_bpe_distributed(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
    checkpoint_every: int = 1,
) -> list[tuple[str, str]]:
    """``learn_bpe`` with every merge round DISTRIBUTED — the scale path
    when the unique-word histogram does NOT fit on the driver (so no
    ``max_words`` cap is forced on you at production 32k-50k-merge
    vocabularies).

    The histogram lives as a DataFrame of (symbols array<string>, cnt)
    and never materializes on the driver. Each round is pure JVM work:

    1. adjacent-pair counts: a transform/slice struct-pair explode over
       the symbol arrays + one groupBy sum (map-side partial agg);
    2. the argmax pair: orderBy(count desc, pair asc) + limit(1) — a
       1-row TakeOrderedAndProject collect (driver-sized: O(1));
    3. fuse: an aggregate() left-fold over each symbol array that joins
       adjacent (p0, p1) left-to-right non-overlapping — the exact loop
       ``learn_bpe`` runs in Python, expressed as a Catalyst higher-order
       function;
    4. re-groupBy identical fused words (keeps the histogram minimal,
       mirroring learn_bpe's new_hist key re-merge).

    ``checkpoint_every``: localCheckpoint cadence (eager). Each round
    reads the previous round's histogram twice (pair count + fuse), so
    checkpointing every round (the default) makes per-round work flat
    and truncates the otherwise O(n_merges)-deep lineage; raise it only
    to trade recompute for fewer materializations. Production note: on a
    multi-executor cluster prefer reliable ``spark.checkpoint`` over
    localCheckpoint every ~64 rounds for executor-loss resilience.

    Identical output to ``learn_bpe`` for the same corpus and cap
    (pytest-pinned): same histogram, same counts, same deterministic
    (count desc, pair asc) tiebreak.
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
            ).alias("w")
        )
        .filter((F.col("w") != "") & (F.col("w") != " "))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_words is not None:
        words = words.orderBy(F.desc("cnt"), F.asc("w")).limit(max_words)
    hist = words.select(
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("symbols"),
        "cnt",
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for round_idx in range(n_merges):
        top = (
            hist.select(
                F.explode(
                    F.expr(
                        "transform(slice(symbols, 1, size(symbols) - 1), "
                        "(x, i) -> struct(x AS p0, element_at(symbols, i + 2) AS p1))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.p0", "p.p1")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("p0"), F.asc("p1"))
            .limit(1)
            .collect()  # driver-sized: exactly the argmax row
        )
        if not top:
            break
        p0, p1 = top[0]["p0"], top[0]["p1"]
        merges.append((p0, p1))
        fused = p0 + p1

        def _merge(acc, x):
            return (
                F.when(
                    acc["pending"].isNull(),
                    F.struct(acc["out"].alias("out"), x.alias("pending")),
                )
                .when(
                    (acc["pending"] == F.lit(p0)) & (x == F.lit(p1)),
                    F.struct(
                        F.array_append(acc["out"], F.lit(fused)).alias("out"),
                        F.lit(None).cast("string").alias("pending"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.array_append(acc["out"], acc["pending"]).alias("out"),
                        x.alias("pending"),
                    )
                )
            )

        def _finish(acc):
            return F.when(acc["pending"].isNull(), acc["out"]).otherwise(
                F.array_append(acc["out"], acc["pending"])
            )

        hist = (
            hist.select(
                F.aggregate(
                    "symbols",
                    F.expr(
                        "struct(cast(array() as array<string>) AS out, "
                        "cast(null as string) AS pending)"
                    ),
                    _merge,
                    _finish,
                ).alias("symbols"),
                "cnt",
            )
            .groupBy("symbols")
            .agg(F.sum("cnt").alias("cnt"))
        )
        if (round_idx + 1) % checkpoint_every == 0:
            hist = hist.localCheckpoint(eager=True)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table.

    mapInPandas: merges ride the task closure (broadcast once per
    executor), each batch keeps a word→tokens cache so the merge loop
    runs once per unique word per batch (Zipf: hot words dominate).
    Output: (id_col, out_col array<string>, n_bpe_real int).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    id_field = df.schema[id_col]

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in _pretokenize(text or ""):
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: toks,
                    "n_bpe_real": toks.map(len).astype("int32"),
                }
            )

    schema = f"{id_col} {id_field.dataType.simpleString()}, {out_col} array<string>, n_bpe_real int"
    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
