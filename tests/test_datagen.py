"""Generator determinism + distribution sanity (FIXTURES.md F1-F3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from nginx_log_spark.datagen import loggen


def test_chunked_generation_is_deterministic():
    a = loggen.sequences_pandas(np.arange(3000, dtype=np.uint64))
    b = pd.concat(
        [
            loggen.sequences_pandas(np.arange(0, 1111, dtype=np.uint64)),
            loggen.sequences_pandas(np.arange(1111, 3000, dtype=np.uint64)),
        ],
        ignore_index=True,
    )
    assert (a.doc_id == b.doc_id).all()
    assert all((x == y).all() for x, y in zip(a.tokens, b.tokens))


def test_tokens_roundtrip_to_line():
    g = loggen.golden_pandas(200)
    seq = loggen.sequences_pandas(np.arange(200, dtype=np.uint64))
    for i in range(200):
        line = bytes(seq.tokens[i].astype(np.uint8)).decode("latin-1")
        assert line == g.line[i]
        assert seq.n_tok[i] == len(g.line[i])


def test_distributions():
    g = loggen.golden_pandas(5000)
    v = g[g.valid]
    assert 0.97 < g.valid.mean() < 1.0  # ~1% malformed
    assert v.exp_remote_addr.value_counts(normalize=True).iloc[0] > 0.15  # hot IP skew
    assert v.exp_status.value_counts(normalize=True)["200"] > 0.8
    assert (v.exp_body_bytes_sent >= 0).all()
    assert set(g.source) == {"web-01", "web-02", "cdn", "edge"}
    # edge lines present
    assert g.line[1].startswith("2001:db8::1 ")
    assert not g.valid[4]  # embedded \" line is rejected by C semantics


def test_spark_generation_matches_pandas(spark):
    df = loggen.sequences_df(spark, 500, partitions=4)
    got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = loggen.sequences_pandas(np.arange(500, dtype=np.uint64))
    assert (got.doc_id == exp.doc_id).all()
    assert (got.n_tok.to_numpy() == exp.n_tok.to_numpy()).all()
    assert all((np.asarray(x) == y).all() for x, y in zip(got.tokens, exp.tokens))
