"""Report parity vs a pandas oracle on the golden fixture (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nginx_log_spark.datagen import loggen
from nginx_log_spark.parse import parse_sequences
from nginx_log_spark.reports import reports as R

N = 5000


@pytest.fixture(scope="module")
def parsed(spark):
    from pyspark.sql import functions as F

    df = loggen.sequences_df(spark, N, partitions=4)
    p = parse_sequences(df).filter(F.col("valid")).cache()
    p.count()
    yield p
    p.unpersist()


@pytest.fixture(scope="module")
def gold():
    g = loggen.golden_pandas(N)
    return g[g.valid].reset_index(drop=True)


def test_totals(parsed, gold):
    t = R.totals(parsed).collect()[0]
    assert t["total_lines"] == len(gold)
    assert t["total_bytes_sent"] == int(gold.exp_body_bytes_sent.sum())
    assert t["unique_ips"] == gold.exp_remote_addr.nunique()


@pytest.mark.parametrize("name", list(R.REPORT_KEYS))
def test_top_counts(parsed, gold, name):
    key = R.REPORT_KEYS[name]
    got = R.top_counts(parsed, key, 100).toPandas()
    exp = (
        gold.groupby("exp_" + key).size().reset_index(name="cnt")
        .rename(columns={"exp_" + key: key})
        .sort_values(["cnt", key], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    assert list(got[key]) == list(exp[key])
    assert list(got.cnt) == list(exp.cnt)
    exp_pct = (exp.cnt / len(gold) * 100).round(2)
    assert np.allclose(got.pct, exp_pct, atol=1e-9)


def test_bytes_by_request(parsed, gold):
    got = R.bytes_by_request(parsed, 100).toPandas()
    exp = (
        gold.groupby("exp_request").exp_body_bytes_sent.sum().reset_index(name="bytes")
        .rename(columns={"exp_request": "request"})
        .sort_values(["bytes", "request"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    assert list(got.request) == list(exp.request)
    assert list(got.bytes) == list(exp.bytes)


def test_bad_code_breakdown(parsed, gold):
    got = R.bad_code_breakdown(parsed, 100).toPandas()
    bad = gold[gold.exp_status != "200"]
    exp = (
        bad.groupby(["exp_status", "exp_request"]).size().reset_index(name="cnt")
        .rename(columns={"exp_status": "status", "exp_request": "request"})
    )
    sec_tot = exp.groupby("status").cnt.transform("sum")
    exp["section_total"] = sec_tot
    exp = (
        exp.sort_values(["status", "cnt", "request"], ascending=[True, False, True])
        .groupby("status")
        .head(100)
        .reset_index(drop=True)
    )
    assert list(got.status) == list(exp.status)
    assert list(got.request) == list(exp.request)
    assert list(got.cnt) == list(exp.cnt)
    assert list(got.section_total) == list(exp.section_total)
    # sections sorted ascending like the 0..998 loop (c/main.c:517-523)
    assert list(got.status) == sorted(got.status, key=str)


def test_bad_code_sections(parsed, gold):
    got = R.bad_code_sections(parsed).toPandas()
    exp = (
        gold[gold.exp_status != "200"].groupby("exp_status").size()
        .reset_index(name="hits").rename(columns={"exp_status": "status"})
        .sort_values("status").reset_index(drop=True)
    )
    assert list(got.status) == list(exp.status)
    assert list(got.hits) == list(exp.hits)


def test_hourly_traffic(parsed, gold):
    got = R.hourly_traffic(parsed).toPandas()
    ts = pd.to_datetime(gold.exp_time_local, format="%d/%b/%Y:%H:%M:%S %z", utc=True)
    exp = (
        gold.assign(hour=ts.dt.floor("h").dt.tz_localize(None))
        .groupby("hour")
        .agg(hits=("exp_request", "size"), bytes=("exp_body_bytes_sent", "sum"))
        .reset_index()
        .sort_values("hour")
    )
    assert len(got) == len(exp)
    assert (pd.to_datetime(got.hour).to_numpy() == exp.hour.to_numpy()).all()
    assert list(got.hits) == list(exp.hits)
    assert list(got.bytes) == list(exp.bytes)


def test_render_report_smoke(parsed):
    from nginx_log_spark.reports.render import byte_format, render_full_report

    assert byte_format(0) == "0 B"
    assert byte_format(1023) == "1023 B"
    assert byte_format(1024) == "1.00 KB"
    assert byte_format(1536) == "1.50 KB"
    assert byte_format(5 * 1024**3) == "5.00 GB"
    text = render_full_report(parsed, k=5)
    assert "来访IP统计" in text and "HTTP流量占比统计" in text and "状态码" in text


def test_fused_reports_match_individual(parsed, gold):
    """The one-shuffle fused query must reproduce every individual report."""
    fused = R.fused_reports(parsed, 100).toPandas()
    # plain count dims
    for name, key in R.REPORT_KEYS.items():
        f = fused[(fused.dim == name) & (fused.rn <= 100)].sort_values("rn")
        ind = R.top_counts(parsed, key, 100).toPandas()
        assert list(f.key) == list(ind[key]), name
        assert list(f.cnt) == list(ind.cnt), name
        assert (f.section_total == len(gold)).all(), name
    # bytes ranking rides on the request dim (rn_bytes)
    f = fused[(fused.dim == "top_requests") & (fused.rn_bytes <= 100)].sort_values("rn_bytes")
    ind = R.bytes_by_request(parsed, 100).toPandas()
    assert list(f.key) == list(ind.request)
    assert list(f.bytes) == list(ind.bytes)
    # bad-code dim
    f = fused[fused.dim == "bad_code"].sort_values(["key", "rn"])
    ind = R.bad_code_breakdown(parsed, 100).toPandas()
    assert list(f.key) == list(ind.status)
    assert list(f.key2) == list(ind.request)
    assert list(f.cnt) == list(ind.cnt)
    assert list(f.section_total) == list(ind.section_total)
    # totals ride along
    t = R.totals(parsed).collect()[0]
    ips = fused[fused.dim == "top_ips"]
    assert ips.section_total.iloc[0] == t["total_lines"]
    assert ips.section_bytes.iloc[0] == t["total_bytes_sent"]
    assert ips.section_keys.iloc[0] == t["unique_ips"]
    # hourly dim matches the timestamp-based report (keys AND counts)
    f = fused[fused.dim == "hourly"].sort_values("key")
    ind = R.hourly_traffic(parsed).toPandas().sort_values("hour")
    assert len(f) == len(ind)
    assert list(f.key) == [h.strftime("%Y-%m-%d %H") for h in ind.hour]
    assert list(f.cnt) == list(ind.hits)
    assert list(f.bytes) == list(ind.bytes)


def test_fused_hourly_mixed_offsets(spark):
    """Lines with different timezone offsets that fall in the SAME UTC hour
    must roll up together in the fused dim, the arrow dim, and
    hourly_traffic (the round-1 fused dim bucketed local wall-clock)."""
    from pyspark.sql import functions as F

    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.parse.parser import encode_lines

    lines = [
        '10.0.0.1 - - [10/Oct/2000:13:55:36 +0000] "GET /a HTTP/1.1" 200 10 "" "u" ""',
        '10.0.0.1 - - [10/Oct/2000:15:55:36 +0200] "GET /a HTTP/1.1" 200 10 "" "u" ""',
        '10.0.0.1 - - [10/Oct/2000:08:25:36 -0530] "GET /a HTTP/1.1" 200 10 "" "u" ""',
        '10.0.0.1 - - [10/Oct/2000:20:55:36 +0000] "GET /a HTTP/1.1" 200 10 "" "u" ""',
    ]
    df = spark.createDataFrame([(f"d{i}", ln, "s") for i, ln in enumerate(lines)],
                               "doc_id string, line string, source string")
    seq = df.select(
        "doc_id", encode_lines(F.col("line")).alias("tokens"), "source"
    ).withColumn("n_tok", F.size("tokens"))
    parsed = parse_sequences(seq).filter(F.col("valid"))

    exp = {"2000-10-10 13": 3, "2000-10-10 20": 1}
    for fused_df in (R.fused_reports(parsed), R.fused_reports_arrow(seq)):
        got = {
            r["key"]: r["cnt"]
            for r in fused_df.filter(F.col("dim") == "hourly").collect()
        }
        assert got == exp
    ht = {r["hour"].strftime("%Y-%m-%d %H"): r["hits"]
          for r in R.hourly_traffic(parsed).collect()}
    assert ht == exp


def test_fused_bad_code_sep_byte_in_request(spark):
    """A request containing the \\x01 separator byte must survive the
    bad_code key round-trip (positional split, not split-at-separator)."""
    from pyspark.sql import functions as F

    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.parse.parser import encode_lines

    req = "GET /a\x01b HTTP/1.1"
    line = f'10.0.0.1 - - [10/Oct/2000:13:55:36 +0000] "{req}" 404 10 "" "u" ""'
    df = spark.createDataFrame([("d0", line, "s")], "doc_id string, line string, source string")
    seq = df.select("doc_id", encode_lines(F.col("line")).alias("tokens"), "source")
    parsed = parse_sequences(seq.withColumn("n_tok", F.size("tokens"))).filter(F.col("valid"))
    rows = R.fused_reports(parsed).filter(F.col("dim") == "bad_code").collect()
    assert len(rows) == 1
    assert rows[0]["key"] == "404"
    assert rows[0]["key2"] == req


def test_fused_reports_arrow_matches_fused(spark):
    """The python-partial-agg fused path == the JVM explode fused path."""
    seq = loggen.sequences_df(spark, N, partitions=4)
    from pyspark.sql import functions as F

    jvm = R.fused_reports(
        parse_sequences(seq).filter(F.col("valid")), 100
    ).toPandas().sort_values(["dim_id", "rn"]).reset_index(drop=True)
    arr = R.fused_reports_arrow(seq, 100).toPandas().sort_values(
        ["dim_id", "rn"]
    ).reset_index(drop=True)
    assert len(jvm) == len(arr)
    for c in ["dim", "key", "key2", "cnt", "bytes", "section_total", "rn", "rn_bytes"]:
        a = jvm[c].fillna("<N>") if jvm[c].dtype == object else jvm[c].fillna(-1)
        b = arr[c].fillna("<N>") if arr[c].dtype == object else arr[c].fillna(-1)
        assert list(a) == list(b), c


def test_cli_extension_flags(tmp_path):
    """--paths/--bursts append extension tables after the parity report
    (subprocess: the CLI owns and stops its own SparkSession)."""
    import subprocess
    import sys

    lines = [
        f'10.0.0.{i % 5} - - [10/Oct/2000:13:{i % 60:02d}:01 +0000] '
        f'"GET /api/x{i % 3}?q={i} HTTP/1.1" {"500" if i % 7 == 0 else "200"} '
        f'{100 + i} "-" "curl/8" "-"'
        for i in range(120)
    ]
    log = tmp_path / "a.log"
    log.write_text("\n".join(lines) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "nginx_log_spark.cli", str(log),
         "--paths", "--bursts", "--no-color", "--no-echo", "--master", "local[4]"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "== method/path (extension) ==" in r.stdout
    assert "/api/x0" in r.stdout and "GET" in r.stdout
    assert "== 5xx burst z-scores (extension) ==" in r.stdout


def test_two_phase_rank_equals_single_window_semantics(spark):
    """Randomized partials with dense count ties: the two-phase bucketed
    top-K must reproduce the one-window reference exactly for every row
    inside the top-k cut, and never pull an outside row under the cut."""
    import random

    import pandas as pd

    from nginx_log_spark.reports.reports import _rank_partials

    rng = random.Random(7)
    rows = []
    for dim in range(10):
        # dims 2 and 5 get enough keys that phase 1 genuinely PRUNES
        # (keys/bucket >> K) — the pruning path must still yield exact
        # ranks for both orderings on every dim
        nkeys = 0 if dim == 9 else (2500 if dim in (2, 5) else 150)
        for i in range(nkeys):
            # heavy ties: counts drawn from a tiny range
            rows.append((dim, f"k{rng.randrange(120):03d}_{i:04d}",
                         rng.randrange(1, 6), rng.randrange(100, 105)))
    for code in ("404", "500"):
        for i in range(60):
            rows.append((9, f"{code}\x01req{i % 40:03d}",
                         rng.randrange(1, 4), rng.randrange(10, 13)))
    partials = spark.createDataFrame(
        rows, "dim_id int, key0 string, cnt long, bytes long"
    )
    K = 20
    got = _rank_partials(partials, K).toPandas()

    # pandas reference: the original single-window semantics
    pdf = pd.DataFrame(rows, columns=["dim_id", "key0", "cnt", "bytes"])
    agg = pdf.groupby(["dim_id", "key0"], as_index=False).sum()
    agg["sect"] = agg.apply(
        lambda r: r.key0[:3] if r.dim_id == 9 else "", axis=1
    )
    ref = {}
    for (dim, sect), g in agg.groupby(["dim_id", "sect"]):
        g = g.sort_values(["cnt", "key0"], ascending=[False, True]).reset_index(drop=True)
        g["rn"] = g.index + 1
        gb = g.sort_values(["bytes", "key0"], ascending=[False, True]).reset_index(drop=True)
        rnb = {k: i + 1 for i, k in enumerate(gb.key0)}
        for _, r in g.iterrows():
            ref[(dim, r.key0)] = (
                int(r.cnt), int(r.bytes), int(r.rn), rnb[r.key0],
                int(g.cnt.sum()), int(g.bytes.sum()), len(g),
            )
    kept_ref = {k for k, v in ref.items() if v[2] <= K or (k[0] == 3 and v[3] <= K)}

    got_keys = set()
    for _, r in got.iterrows():
        key0 = r.key if r.dim_id != 9 else f"{r.key}\x01{r.key2}"
        got_keys.add((int(r.dim_id), key0))
        cnt, byt, rn, rnb, st, sb, sk = ref[(int(r.dim_id), key0)]
        assert (int(r.cnt), int(r.bytes)) == (cnt, byt)
        assert (int(r.section_total), int(r.section_bytes), int(r.section_keys)) == (st, sb, sk)
        if rn <= K:
            assert int(r.rn) == rn
        else:
            assert int(r.rn) > K  # never pulled under the cut
        if rnb <= K:
            assert int(r.rn_bytes) == rnb
        else:
            assert int(r.rn_bytes) > K
    assert got_keys == kept_ref


def test_cli_any_digit_status_flag(tmp_path):
    """--any-digit-status selects the Nim/C++ parse semantics end to end:
    a 4-digit status line is rejected by default (C gate) but counted with
    the flag."""
    import subprocess
    import sys

    lines = [
        '10.0.0.1 - - [10/Oct/2000:13:55:36 +0000] "GET /a HTTP/1.1" 200 10 "-" "u" "-"',
        '10.0.0.2 - - [10/Oct/2000:13:55:37 +0000] "GET /b HTTP/1.1" 2000 10 "-" "u" "-"',
    ]
    log = tmp_path / "s.log"
    log.write_text("\n".join(lines) + "\n")
    base = [sys.executable, "-m", "nginx_log_spark.cli", str(log),
            "--no-color", "--no-echo", "--master", "local[2]"]
    strict = subprocess.run(base, capture_output=True, text=True, timeout=300)
    assert strict.returncode == 0, strict.stderr[-1500:]
    loose = subprocess.run(base + ["--any-digit-status"],
                           capture_output=True, text=True, timeout=300)
    assert loose.returncode == 0, loose.stderr[-1500:]
    # the C-semantics run counts 1 valid line, the Nim-semantics run 2
    assert "10.0.0.2" not in strict.stdout
    assert "10.0.0.2" in loose.stdout and "2000" in loose.stdout
