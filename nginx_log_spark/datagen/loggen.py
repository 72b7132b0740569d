"""Deterministic synthetic nginx-log generator (FIXTURES.md F1-F3).

Every value is a pure function of (row id, seed) via a splitmix64-style
vectorized mixer — no RNG state, so generation is embarrassingly parallel:
``spark.range(N).mapInPandas(...)`` produces the identical table at any
parallelism / partitioning, which is exactly how you'd synthesize a
10^12-row fixture on a 1000-executor cluster.

Shape matches BASELINE.json input_hint: (doc_id string, tokens array<int32>,
n_tok int32, source string); ``tokens`` is the UTF-8 byte sequence of one
combined-format line (README.MD:32-37 of the reference). ~1% of lines are
deterministically malformed to exercise the reject path (c/main.c:480-483).
Skew: Zipf-weighted IP and URI pools (one hot IP / hot URI ~ 15-20% of
lines) for top-K and salting tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over (id, salt) — vectorized uint64."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + np.uint64(salt) * _GOLD
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    return _mix(ids, salt).astype(np.float64) / np.float64(2**64)


def _zipf_pick(ids: np.ndarray, salt: int, n_items: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_items + 1) ** alpha
    cdf = np.cumsum(w) / w.sum()
    return np.searchsorted(cdf, _u01(ids, salt), side="right").clip(0, n_items - 1)


def _cat_pick(ids: np.ndarray, salt: int, probs: list[float]) -> np.ndarray:
    cdf = np.cumsum(np.asarray(probs))
    return np.searchsorted(cdf, _u01(ids, salt), side="right").clip(0, len(probs) - 1)


# ---------------------------------------------------------------------------
# pools (all ASCII so byte == char)
# ---------------------------------------------------------------------------

N_IPS = 505
_IP_POOL = np.array(
    [f"10.{k // 250}.{k % 250}.{(7 * k) % 250 + 1}" for k in range(500)]
    + ["2001:db8::1", "2001:db8::2", "fe80::1", "::1", "2001:db8:0:1::beef"]
)
_METHODS = np.array(["GET"] * 8 + ["POST", "HEAD"])
_URI_POOL = np.array(
    [f"/api/v{k % 3}/item/{k}" if k % 4 else f"/static/asset{k}.js" for k in range(200)]
)
_STATUS_POOL = np.array(["200", "301", "404", "500", "502"])
_STATUS_P = [0.85, 0.04, 0.06, 0.03, 0.02]
_USER_POOL = np.array(["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"])
_REFERER_POOL = np.array(
    [f"https://ref{k}.example.com/page/{k * 3}" for k in range(49)] + ["https://www.google.com/"]
)
_UA_POOL = np.array(
    [f"Mozilla/5.0 (X11; Linux x86_64) Gecko/201001{k:02d} Firefox/{k}.0" for k in range(20)]
    + [f"Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/{90 + k}.0.{k}" for k in range(10)]
    + ["curl/8.5.0", "Wget/1.21", "python-requests/2.31", "Apache-HttpClient/4.5"]
    + [f"Googlebot/2.1 (+http://www.google.com/bot.html) v{k}" for k in range(3)]
    + ["bingbot/2.0", "YandexBot/3.0", "AhrefsBot/7.0"]
)
_SOURCE_POOL = np.array(["web-01", "web-02", "cdn", "edge"])

_TS_BASE = np.int64(971211600)  # 2000-10-10 21:00:00 UTC, near the reference's sample date
_TS_SPAN = 172800  # 48h walk (FIXTURES.md F2)

MALFORMED_MOD = 97  # ~1% of rows


def fields_for_ids(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Golden parsed fields (FIXTURES.md F2) as a pure function of ids."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    s = seed * 1000

    ip_idx = _zipf_pick(ids, s + 1, N_IPS, 1.2)
    uri_idx = _zipf_pick(ids, s + 2, len(_URI_POOL), 1.3)
    method = _METHODS[_mix(ids, s + 3) % np.uint64(len(_METHODS))]
    status = _STATUS_POOL[_cat_pick(ids, s + 4, _STATUS_P)]
    user_anon = _u01(ids, s + 5) < 0.9
    user = np.where(user_anon, "-", _USER_POOL[_mix(ids, s + 6) % np.uint64(8)])
    # lognormal-ish bytes: exp scale, ~2% zeros, cap 5 MiB
    u = _u01(ids, s + 7)
    body = np.where(u < 0.02, 0, np.floor(np.exp(u * 14.0) * 3.0)).astype(np.int64)
    body = np.minimum(body, 5 * 1024 * 1024)
    ref_empty = _u01(ids, s + 8) < 0.3
    referer = np.where(ref_empty, "", _REFERER_POOL[_mix(ids, s + 9) % np.uint64(50)])
    ua = _UA_POOL[_mix(ids, s + 10) % np.uint64(len(_UA_POOL))]
    xff_u = _u01(ids, s + 11)
    xff_ip1 = _IP_POOL[_mix(ids, s + 12) % np.uint64(500)]
    xff_ip2 = _IP_POOL[_mix(ids, s + 13) % np.uint64(500)]
    xff_pair = np.char.add(xff_ip1.astype(str), np.char.add(", ", xff_ip2.astype(str)))
    xff = np.where(xff_u < 0.7, "", np.where(xff_u < 0.9, xff_ip1, xff_pair))
    ts_sec = _TS_BASE + (_mix(ids, s + 14) % np.uint64(_TS_SPAN)).astype(np.int64)
    time_local = (
        pd.to_datetime(ts_sec, unit="s", utc=True)
        .strftime("%d/%b/%Y:%H:%M:%S +0000")
        .to_numpy()
    )
    source = _SOURCE_POOL[_mix(ids, s + 15) % np.uint64(4)]

    request = np.char.add(
        np.char.add(method.astype(str), " "),
        np.char.add(_URI_POOL[uri_idx].astype(str), " HTTP/1.1"),
    )
    return pd.DataFrame(
        {
            "id": ids.astype(np.int64),
            "doc_id": pd.Series(ids.astype(np.int64)).map("d{:010d}".format),
            "remote_addr": _IP_POOL[ip_idx],
            "remote_user": user,
            "time_local": time_local,
            "request": request,
            "status": status,
            "body_bytes_sent": body,
            "http_referer": referer,
            "http_user_agent": ua,
            "http_x_forwarded_for": xff,
            "source": source,
        }
    )


def render_lines(f: pd.DataFrame, seed: int = 42) -> pd.Series:
    """Render combined-format lines; corrupt ~1% deterministically (F1)."""
    line = (
        f["remote_addr"].astype(str)
        + " - "
        + f["remote_user"].astype(str)
        + " ["
        + f["time_local"].astype(str)
        + '] "'
        + f["request"].astype(str)
        + '" '
        + f["status"].astype(str)
        + " "
        + f["body_bytes_sent"].astype(str)
        + ' "'
        + f["http_referer"].astype(str)
        + '" "'
        + f["http_user_agent"].astype(str)
        + '" "'
        + f["http_x_forwarded_for"].astype(str)
        + '"'
    )
    ids = f["id"].to_numpy(np.uint64)
    bad = (ids % np.uint64(MALFORMED_MOD)) == 0
    if bad.any():
        kind = (_mix(ids, seed * 1000 + 99) % np.uint64(3)).astype(np.int64)
        line = line.copy()
        trunc = bad & (kind == 0)
        line[trunc] = line[trunc].str.slice(0, 25)  # mid-field truncation
        noquote = bad & (kind == 1)
        line[noquote] = line[noquote].str.replace('"', "", n=1)  # drop an opening quote
        shortstatus = bad & (kind == 2)
        # '" <3 digits> ' anchors to the status slot right after the request
        line[shortstatus] = line[shortstatus].str.replace(
            r'" (\d{3}) ', '" 99 ', n=1, regex=True
        )
    return line


# hand-written edge lines pinned to the first ids (FIXTURES.md F1 edge list)
_EDGE_LINES = [
    '2001:db8::1 - - [10/Oct/2000:13:55:36 +0000] "GET /edge HTTP/1.1" 200 1 "" "EdgeUA" ""',
    '10.0.0.1 - alice [10/Oct/2000:13:55:37 +0000] "GET /a b HTTP/1.1" 404 0 "" "UA [x; y]" ""',
    '10.0.0.8   -   bob   [10/Oct/2000:13:55:38 +0000]   "GET /sp HTTP/1.1"   301   7   "r"   "u"   "x"',
    '10.0.0.1 - - [10/Oct/2000:13:55:39 +0000] "GET /q\\" HTTP/1.1" 200 5 "r" "u" "x"',
    '10.0.0.2 - - [10/Oct/2000:13:55:40 +0000] "HEAD /zero HTTP/1.1" 200 0 "" "curl/8.5.0" "10.1.1.1, 10.2.2.2"',
]


def _edge_overlay(pdf: pd.DataFrame, lines: pd.Series) -> pd.Series:
    ids = pdf["id"].to_numpy()
    lines = lines.copy()
    for k, el in enumerate(_EDGE_LINES):
        m = ids == (k + 1)
        if m.any():
            lines[m] = el
    return lines


def sequences_pandas(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """(doc_id, tokens, n_tok, source) rows for the given ids."""
    f = fields_for_ids(ids, seed)
    lines = _edge_overlay(f, render_lines(f, seed))
    b = lines.str.encode("latin-1")
    tokens = b.map(lambda x: np.frombuffer(x, dtype=np.uint8).astype(np.int32))
    return pd.DataFrame(
        {
            "doc_id": f["doc_id"],
            "tokens": tokens,
            "n_tok": b.str.len().astype(np.int32),
            "source": f["source"],
        }
    )


def golden_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Golden fields + rendered line + validity for the first n ids (tests)."""
    from nginx_log_spark.parse import oracle

    f = fields_for_ids(np.arange(n, dtype=np.uint64), seed)
    lines = _edge_overlay(f, render_lines(f, seed))
    f = f.copy()
    f["line"] = lines
    parsed = lines.map(oracle.parse_line)
    f["valid"] = parsed.notna()
    for k in (
        "remote_addr remote_user time_local request status body_bytes_sent "
        "http_referer http_user_agent http_x_forwarded_for".split()
    ):
        f["exp_" + k] = parsed.map(lambda d, k=k: d[k] if d else None)
    return f


SEQ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def sequences_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range(n) -> mapInPandas (id-keyed, order-free)."""

    def gen(it):
        for pdf in it:
            yield sequences_pandas(pdf["id"].to_numpy(np.uint64), seed)

    rng = spark.range(0, n, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, SEQ_SCHEMA)


def write_sequences(
    spark: SparkSession, n: int, path: str, seed: int = 42, partitions: int | None = None
) -> None:
    """Materialize the fixture table as parquet (Iceberg-shaped; the writer
    becomes ``.writeTo(tbl)`` when an Iceberg catalog is on the classpath)."""
    sequences_df(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
