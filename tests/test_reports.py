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
    # hourly dim matches the timestamp-based report
    f = fused[fused.dim == "hourly"]
    ind = R.hourly_traffic(parsed).toPandas()
    assert len(f) == len(ind)
    assert sorted(f.cnt) == sorted(ind.hits)


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
