"""Sequence packing + deterministic sampling + token histogram.

Local Python reference implementations (plain loops over collected rows)
check the distributed two-level prefix sum and the chunk reassembly
byte-for-byte.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nginx_log_spark.functions import (
    chunk_stats,
    deterministic_shuffle,
    hash_sample,
    hash_uniform,
    pack_chunks,
    pack_offsets,
    stratified_sample,
    train_val_split,
)
from nginx_log_spark.parse import token_histogram

MAX_LEN = 16


@pytest.fixture(scope="module")
def seq_df(spark):
    # deterministic variable-length token sequences, incl. empty and
    # longer-than-max_len docs (a doc spanning 4+ chunks)
    rows = []
    for i in range(200):
        n = (i * 7) % 71  # 0..70 tokens -> spans up to 5 chunks of 16
        toks = [(i * 31 + j * 13) % 251 for j in range(n)]
        rows.append((i, toks, n, f"src{i % 3}"))
    return spark.createDataFrame(
        rows, "id long, tokens array<int>, n_tok int, source string"
    )


def _local_offsets(rows):
    out, acc = {}, 0
    for i, toks, n, _ in sorted(rows, key=lambda r: r[0]):
        out[i] = acc
        acc += n
    return out, acc


def test_pack_offsets_matches_serial_cumsum(spark, seq_df):
    got = {
        r["id"]: (r["offset"], r["chunk_first"], r["chunk_last"])
        for r in pack_offsets(
            seq_df, "id", F.expr("id div 16"), MAX_LEN
        ).collect()
    }
    exp, total = _local_offsets(seq_df.collect())
    assert len(got) == 200
    for i, off in exp.items():
        n = (i * 7) % 71
        assert got[i][0] == off
        assert got[i][1] == off // MAX_LEN
        assert got[i][2] == max(off + n - 1, off) // MAX_LEN


def test_pack_offsets_bucket_granularity_invariant(spark, seq_df):
    a = pack_offsets(seq_df, "id", F.expr("id div 16"), MAX_LEN)
    b = pack_offsets(seq_df, "id", F.expr("id div 100"), MAX_LEN)
    assert sorted((r["id"], r["offset"]) for r in a.collect()) == sorted(
        (r["id"], r["offset"]) for r in b.collect()
    )


def test_pack_chunks_reassembles_concat_stream(spark, seq_df):
    offs = pack_offsets(seq_df, "id", F.expr("id div 16"), MAX_LEN)
    chunks = {r["chunk_id"]: r for r in pack_chunks(offs, MAX_LEN).collect()}
    # local reference: concatenate in id order, chunk by MAX_LEN
    stream = []
    for i, toks, n, _ in sorted(seq_df.collect(), key=lambda r: r[0]):
        stream.extend(toks)
    n_chunks = (len(stream) + MAX_LEN - 1) // MAX_LEN
    assert set(chunks) == set(range(n_chunks))
    for c in range(n_chunks):
        assert chunks[c]["tokens"] == stream[c * MAX_LEN : (c + 1) * MAX_LEN]
    # all full except possibly the last
    for c in range(n_chunks - 1):
        assert chunks[c]["n_filled"] == MAX_LEN


def test_pack_chunks_pad_and_drop_last(spark, seq_df):
    offs = pack_offsets(seq_df, "id", F.expr("id div 16"), MAX_LEN)
    total = seq_df.agg(F.sum("n_tok")).collect()[0][0]
    if total % MAX_LEN == 0:
        pytest.skip("fixture stream happens to be chunk-aligned")
    padded = pack_chunks(offs, MAX_LEN, pad_id=0)
    assert padded.where(F.size("tokens") != MAX_LEN).count() == 0
    dropped = pack_chunks(offs, MAX_LEN, drop_last=True)
    assert dropped.count() == total // MAX_LEN


def test_chunk_stats_token_sum(spark, seq_df):
    offs = pack_offsets(seq_df, "id", F.expr("id div 16"), MAX_LEN)
    stats = chunk_stats(pack_chunks(offs, MAX_LEN))
    grand = stats.agg(F.sum("token_sum")).collect()[0][0]
    exp = sum(sum(r["tokens"]) for r in seq_df.collect())
    assert grand == exp


def test_deterministic_shuffle_rank_is_md5_order(spark, seq_df):
    ranked = deterministic_shuffle(seq_df, "id", seed="s1", rank=True).collect()
    exp_order = sorted(
        (hashlib.md5(f"s1{r['id']}".encode()).hexdigest(), r["id"]) for r in ranked
    )
    exp_rank = {i: r for r, (_, i) in enumerate(exp_order)}
    for r in ranked:
        assert r["shuffle_rank"] == exp_rank[r["id"]]


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _u(seed: str, key) -> float:
    return int(hashlib.md5(f"{seed}{key}".encode()).hexdigest()[:8], 16) / 2**32


def test_hash_sample_exact_membership(spark, seq_df):
    got = {r["id"] for r in hash_sample(seq_df, 0.3, "id", seed="z").collect()}
    exp = {i for i in range(200) if _u("z", i) < 0.3}
    assert got == exp
    assert 0 < len(got) < 200


def test_hash_uniform_range(spark, seq_df):
    vals = [
        r["u"]
        for r in seq_df.select(hash_uniform("id", "q").alias("u")).collect()
    ]
    assert all(0.0 <= v < 1.0 for v in vals)


def test_stratified_sample_rates(spark, seq_df):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    got = stratified_sample(seq_df, rates, "source", "id", seed="m").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["id"])
    assert len(by_src.get("src0", set())) == 67  # ids ≡ 0 mod 3: all kept
    assert "src2" not in by_src
    exp1 = {i for i in range(200) if i % 3 == 1 and _u("m", i) < 0.5}
    assert by_src.get("src1", set()) == exp1


def test_train_val_split_disjoint_exhaustive_stable(spark, seq_df):
    s1 = train_val_split(seq_df, 0.25, "id", seed="v")
    rows = s1.collect()
    assert len(rows) == 200
    val = {r["id"] for r in rows if r["split"] == "val"}
    train = {r["id"] for r in rows if r["split"] == "train"}
    assert val | train == set(range(200)) and not (val & train)
    # repartitioned run = same assignment (determinism across parallelism)
    rows2 = train_val_split(seq_df.repartition(7), 0.25, "id", seed="v").collect()
    assert {r["id"]: r["split"] for r in rows2} == {r["id"]: r["split"] for r in rows}


# ---------------------------------------------------------------------------
# token histogram
# ---------------------------------------------------------------------------


def test_token_histogram_matches_explode(spark, seq_df):
    got = {r["token"]: r["cnt"] for r in token_histogram(seq_df).collect()}
    exp = {}
    for r in seq_df.collect():
        for t in r["tokens"]:
            exp[t] = exp.get(t, 0) + 1
    assert got == exp


def test_length_bucket_batches_matches_flat_window(spark):
    """The two-level per-bucket rank == a flat per-bucket row_number, and
    batch padding stats follow: every batch except a bucket's last has
    exactly batch_size rows, and padding_frac is 1 - sum/(n*max)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nginx_log_spark.functions import batch_stats, length_bucket_batches

    n = 1000
    pdf = pd.DataFrame({
        "id": range(n),
        "n_tok": [(7 * i) % 300 + 1 for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    out = length_bucket_batches(
        df, "id", F.expr("id div 100"), batch_size=16
    ).toPandas()

    # reference: flat pandas rank within each len bucket
    pdf["lb"] = pdf.n_tok.apply(lambda t: t.bit_length() - 1)
    pdf["rank"] = pdf.sort_values("id").groupby("lb").cumcount()
    ref = pdf.set_index("id").sort_index()
    got = out.set_index("id").sort_index()
    assert (got.len_bucket == ref.lb).all()
    assert (got.rank_in_bucket == ref["rank"]).all()
    assert (got.batch_idx == ref["rank"] // 16).all()

    st = batch_stats(
        length_bucket_batches(df, "id", F.expr("id div 100"), batch_size=16)
    ).toPandas()
    full = st[st.n_seqs == 16]
    assert len(full) > 10
    # every non-final batch is exactly full
    last_per_bucket = st.groupby("len_bucket").batch_idx.max()
    partial = st[st.n_seqs < 16]
    assert all(
        r.batch_idx == last_per_bucket[r.len_bucket] for r in partial.itertuples()
    )
    exp_pad = (1 - st.sum_len / (st.n_seqs * st.max_len)).round(6)
    assert (st.padding_frac - exp_pad).abs().max() < 1e-9


def test_chunk_windows_cover_and_sum(spark, seq_df):
    """Overlapping windows: exact per-window slices vs a local loop —
    starts every stride until a window reaches the doc end (no window
    fully contained in an earlier one), truncated tail, exact token
    sums, empty docs emit nothing."""
    import math

    from nginx_log_spark.functions import chunk_windows

    W, S = 16, 12
    rows = {r["id"]: r["tokens"] for r in seq_df.collect()}
    out = chunk_windows(seq_df, window=W, stride=S, id_col="id").collect()
    got = {(r.id, r.chunk_idx): (r.start, r.chunk_len, r.token_sum) for r in out}
    want = {}
    for i, toks in rows.items():
        if not toks:
            continue
        last = math.ceil(max(0, len(toks) - W) / S) * S
        for ci, s in enumerate(range(0, last + 1, S)):
            sl = toks[s : s + W]
            want[(i, ci)] = (s, len(sl), sum(sl))
    assert got == want
    # no window is a subset of another (the redundant-tail regression)
    for i, toks in rows.items():
        spans = sorted(
            (s, s + ln) for (di, _), (s, ln, _) in got.items() if di == i
        )
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert not (a0 <= b0 and b1 <= a1) and not (b0 <= a0 and a1 <= b1)
    # every token position of every non-empty doc is covered by >= 1 window
    for i, toks in rows.items():
        covered = set()
        for (di, _), (s, ln, _) in got.items():
            if di == i:
                covered.update(range(s, s + ln))
        assert covered == set(range(len(toks)))
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(seq_df, window=8, stride=9, id_col="id")
