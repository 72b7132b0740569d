"""Sequence packing for LLM training pipelines: concatenate token sequences
in a deterministic global order and chunk into fixed-length training
examples (GPT-style "concat and chunk").

Scale design (the whole point at 10^12 sequences):

* A naive global ``row_number()/sum() OVER (ORDER BY ...)`` window plans a
  SINGLE-partition sort — a non-starter at scale. ``pack_offsets`` instead
  computes the global token prefix-sum in TWO levels:

    1. bucket level: ``groupBy(bucket)`` -> per-bucket token totals
       (#buckets rows, ~10^3-10^5), cumsum'd with a window over that TINY
       frame, broadcast-joined back;
    2. row level: cumsum within each bucket (``Window.partitionBy(bucket)``)
       — shuffles the data once by bucket and sorts each bucket in
       parallel.

  The bucket expression must be MONOTONE NON-DECREASING in the global
  order key (e.g. ``id div 10^6`` for a numeric id, or the day partition
  of a time-ordered log) — that is what makes bucket-base + local-offset
  equal the global prefix sum.

* ``pack_chunks`` never materializes the concatenated stream: each doc
  explodes into only the chunks it overlaps (≤ n_tok/max_len + 1 spans),
  slices JVM-side (``F.slice``), and one shuffle by chunk_id reassembles
  fixed-length examples. Shuffle volume = token volume, no skew (chunk
  sizes are uniform by construction).

Reference tie-in: the reference engine (suconghou/nginx_log) has no
packing operator — this is part of the training-data surface grafted on
top of its tokenized-sequence input shape (BASELINE.json input_hint:
``doc_id, tokens:array<int32>, n_tok, source``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    order_col: Column | str,
    bucket_col: Column | str,
    max_len: int,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Global token offset of every sequence under the deterministic order.

    Adds:
      * ``offset``      — tokens preceding this doc in the concat stream
      * ``chunk_first`` — first max_len-chunk this doc lands in
      * ``chunk_last``  — last chunk this doc overlaps (== chunk_first for
                          empty docs)

    ``order_col`` must be a total order (unique key); ``bucket_col`` must be
    monotone non-decreasing in it. Plan shape: one data shuffle (by bucket)
    + one tiny bucket-level aggregate; no single-partition window over the
    data.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    n_tok = F.col(n_tok_col).cast("long")

    with_b = df.withColumn("_pk_bucket", bucket)
    # level 1: per-bucket totals -> cumulative base. #buckets rows only, so
    # the ORDER BY window here is over a frame that fits on one core anyway.
    btot = with_b.groupBy("_pk_bucket").agg(F.sum(n_tok).alias("_pk_btok"))
    wb = Window.orderBy("_pk_bucket").rowsBetween(Window.unboundedPreceding, -1)
    base = btot.select(
        "_pk_bucket",
        F.coalesce(F.sum("_pk_btok").over(wb), F.lit(0)).alias("_pk_base"),
    )
    # level 2: within-bucket running sum, parallel across buckets.
    wr = Window.partitionBy("_pk_bucket").orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        with_b.join(F.broadcast(base), "_pk_bucket")
        .withColumn(
            "offset",
            (F.col("_pk_base") + F.coalesce(F.sum(n_tok).over(wr), F.lit(0))).cast(
                "long"
            ),
        )
        # `div` = exact integer division (a double quotient loses exactness
        # past 2^53 — reachable in a 10^12-sequence token stream)
        .withColumn("chunk_first", F.expr(f"offset div {max_len}"))
        .withColumn(
            "chunk_last",
            F.expr(
                f"greatest(offset + cast({n_tok_col} as long) - 1, offset)"
                f" div {max_len}"
            ),
        )
        .drop("_pk_bucket", "_pk_base")
    )
    return out


def pack_chunks(
    offsets_df: DataFrame,
    max_len: int,
    tokens_col: str = "tokens",
    pad_id: int | None = None,
    drop_last: bool = False,
) -> DataFrame:
    """Materialize fixed-length packed examples from ``pack_offsets`` output.

    Returns ``(chunk_id, tokens, n_filled, n_docs)`` where ``tokens`` is the
    concat-stream slice ``[chunk_id*max_len, (chunk_id+1)*max_len)``.
    ``pad_id`` pads the final partial chunk to max_len; ``drop_last`` drops
    it instead. All slicing/assembly is JVM expressions (whole-stage
    codegen); the single shuffle is by uniform chunk_id.
    """
    L = F.lit(max_len)
    off = F.col("offset")
    ntk = F.col("n_tok").cast("long")

    spans = (
        offsets_df.where(ntk > 0)
        .select(
            off.alias("offset"),
            ntk.alias("_n"),
            F.col(tokens_col).alias("_toks"),
            F.explode(F.sequence(F.col("chunk_first"), F.col("chunk_last"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "chunk_id",
            "offset",
            # doc-relative 1-based slice start for this chunk's overlap
            (F.greatest(F.col("chunk_id") * L, off) - off + 1).alias("_s"),
            (
                F.least((F.col("chunk_id") + 1) * L, off + F.col("_n"))
                - F.greatest(F.col("chunk_id") * L, off)
            ).alias("_len"),
            "_toks",
        )
        .select(
            "chunk_id",
            "offset",
            F.slice("_toks", F.col("_s").cast("int"), F.col("_len").cast("int")).alias(
                "_piece"
            ),
        )
    )
    assembled = spans.groupBy("chunk_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("offset", "_piece"))),
                lambda s: s["_piece"],
            )
        ).alias("tokens"),
        F.count_if(F.size("_piece") > 0).alias("n_docs"),
    )
    out = assembled.withColumn("n_filled", F.size("tokens").cast("int"))
    if drop_last:
        out = out.where(F.col("n_filled") == max_len)
    elif pad_id is not None:
        out = out.withColumn(
            "tokens",
            F.concat(
                "tokens",
                F.array_repeat(
                    F.lit(pad_id).cast("int"), max_len - F.col("n_filled")
                ),
            ),
        )
    return out.select("chunk_id", "tokens", "n_filled", "n_docs")


def chunk_stats(chunks_df: DataFrame) -> DataFrame:
    """Per-chunk integrity stats (oracle-checkable without shipping arrays):
    filled length, doc-span count, and the exact token sum."""
    return chunks_df.select(
        "chunk_id",
        F.col("n_filled"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("token_sum"),
    )


def length_bucket_batches(
    df: DataFrame,
    order_col: Column | str,
    order_bucket_col: Column | str,
    batch_size: int,
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Dynamic batching: group sequences of SIMILAR length into fixed-count
    batches, the padding-efficiency alternative to concat-and-chunk (a
    batch padded to its own max wastes far less than padding everything to
    the global max — the standard bucketed-batching recipe).

    Length bucket = floor(log2(n_tok)) via the integer-exact bin()-length
    trick (no floating log); within each bucket rows take a deterministic
    rank in ``order_col`` order and ``batch_idx = rank div batch_size``.
    The per-bucket rank reuses the two-level prefix-sum shape: per
    (len_bucket, order_bucket) counts cumsum'd over the TINY bucket frame
    (window partitioned by len_bucket over order_bucket), broadcast back,
    plus a within-(len_bucket, order_bucket) row_number — no
    single-partition window over the data. ``order_bucket_col`` must be
    monotone non-decreasing in ``order_col`` (same contract as
    pack_offsets).

    Adds ``len_bucket``, ``rank_in_bucket``, ``batch_idx``.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    ob = (
        F.col(order_bucket_col)
        if isinstance(order_bucket_col, str)
        else order_bucket_col
    )
    n_tok = F.col(n_tok_col).cast("long")
    lb = F.when(n_tok <= 0, F.lit(0)).otherwise(F.length(F.bin(n_tok)) - 1)
    staged = df.withColumn("_lb", lb.cast("int")).withColumn("_ob", ob)
    tot = staged.groupBy("_lb", "_ob").agg(F.count(F.lit(1)).alias("_n"))
    wb = Window.partitionBy("_lb").orderBy("_ob").rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = tot.select(
        "_lb", "_ob", F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_base")
    )
    wr = Window.partitionBy("_lb", "_ob").orderBy(order)
    out = (
        staged.join(F.broadcast(base), ["_lb", "_ob"])
        .withColumn(
            "rank_in_bucket",
            (F.col("_base") + F.row_number().over(wr) - 1).cast("long"),
        )
        .withColumn("batch_idx", F.expr(f"rank_in_bucket div {batch_size}"))
        .withColumnRenamed("_lb", "len_bucket")
        .drop("_ob", "_base")
    )
    return out


def batch_stats(batched: DataFrame, n_tok_col: str = "n_tok") -> DataFrame:
    """Per-(len_bucket, batch_idx) padding accounting: sequence count, the
    batch's own max length (its padded width), exact token sum, and the
    padding fraction ``1 - sum / (count * max)`` — the number bucketed
    batching exists to minimize."""
    n_tok = F.col(n_tok_col).cast("long")
    agg = batched.groupBy("len_bucket", "batch_idx").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max(n_tok).alias("max_len"),
        F.sum(n_tok).alias("sum_len"),
    )
    pad = F.lit(1.0) - F.col("sum_len") / (F.col("n_seqs") * F.col("max_len"))
    return agg.withColumn("padding_frac", F.round(pad, 6))


def deterministic_shuffle(
    df: DataFrame,
    key_col: Column | str,
    seed: str = "0",
    rank: bool = False,
) -> DataFrame:
    """Reproducible global shuffle: order rows by ``md5(seed || key)``.

    Adds ``shuffle_key`` (the hex hash). With ``rank=True`` also adds the
    exact global ``shuffle_rank`` (0-based) — computed scalably by reusing
    the two-level prefix sum with the hash's own first byte as the bucket
    (monotone in the hash order AND uniform, so no skew).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    out = df.withColumn("shuffle_key", F.md5(F.concat(F.lit(seed), key.cast("string"))))
    if not rank:
        return out
    ranked = pack_offsets(
        out.withColumn("_one", F.lit(1)),
        order_col="shuffle_key",
        bucket_col=F.substring("shuffle_key", 1, 2),
        max_len=1,
        n_tok_col="_one",
    )
    return ranked.withColumnRenamed("offset", "shuffle_rank").drop(
        "_one", "chunk_first", "chunk_last"
    )


def chunk_windows(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping chunk windows per document — the retrieval/RAG indexing
    transform (and the BERT-style sliding-window pretraining split): each
    doc's token array becomes windows of ``window`` tokens starting every
    ``stride`` tokens (stride < window => overlap of window - stride), the
    last window truncated at the doc boundary. No cross-doc state at all,
    so unlike concat-and-chunk packing (pack_offsets/pack_chunks) this
    needs NO prefix sum and NO shuffle: it is a pure JVM projection +
    explode — scan speed at any scale, and the output partitioning is the
    input's.

    Emits (id, chunk_idx, start, chunk_len, token_sum): token_sum is the
    exact integer sum of the window's tokens, the cheap integrity
    fingerprint a downstream embedder batch can re-verify after transport.
    Empty docs emit no windows (there is nothing to retrieve).

    The start sequence stops at the first stride multiple >= n - window
    (ceil((n - window) / stride) * stride): once a window reaches the doc
    end, later strides would only emit shorter windows fully CONTAINED in
    it — redundant rows in a retrieval index. So every token is covered,
    the last window is the only truncated one, and no window is a subset
    of another.
    """
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride} > {window}")
    n = F.size(F.col(tokens_col))
    starts = F.expr(
        f"sequence(0, cast(ceil(greatest(0, size({tokens_col}) - {window}) "
        f"/ {stride}) as int) * {stride}, {stride})"
    )
    out = (
        df.filter(n >= 1)
        .select(F.col(id_col), F.col(tokens_col), F.explode(starts).alias("start"))
        .select(
            id_col,
            (F.col("start") / stride).cast("long").alias("chunk_idx"),
            F.col("start").cast("long"),
            F.least(F.lit(window), n - F.col("start")).cast("long").alias("chunk_len"),
            F.expr(
                f"aggregate(slice({tokens_col}, start + 1, "
                f"least({window}, size({tokens_col}) - start)), "
                "0L, (acc, x) -> acc + x)"
            ).alias("token_sum"),
        )
    )
    return out
