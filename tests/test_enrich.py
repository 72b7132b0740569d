"""GeoIP/CIDR + UA enrichment tests (SURVEY.md §2.7)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nginx_log_spark.enrich.geoip import (
    _cidr_to_range,
    default_cidr_table,
    enrich_geoip,
    flatten_cidrs,
    ip_to_int_col,
)
from nginx_log_spark.enrich.ua import classify_ua_col


def test_cidr_to_range():
    assert _cidr_to_range("10.0.0.0/24") == (10 << 24, (10 << 24) + 255, 24)
    assert _cidr_to_range("1.2.3.4/32") == ((1 << 24) + (2 << 16) + (3 << 8) + 4,) * 2 + (32,)
    lo, hi, p = _cidr_to_range("0.0.0.0/0")
    assert (lo, hi, p) == (0, 2**32 - 1, 0)


def test_flatten_longest_prefix_wins():
    rules = [
        {"cidr": "10.0.0.0/8", "country": "A", "asn": "1"},
        {"cidr": "10.1.0.0/16", "country": "B", "asn": "2"},
        {"cidr": "10.1.2.0/24", "country": "C", "asn": "3"},
    ]
    flat = flatten_cidrs(rules)
    # disjoint, sorted, covering
    for i in range(len(flat) - 1):
        assert flat[i]["end_ip"] < flat[i + 1]["start_ip"]

    def lookup(ip_int):
        for r in flat:
            if r["start_ip"] <= ip_int <= r["end_ip"]:
                return r["country"]
        return None

    assert lookup((10 << 24) + 5) == "A"
    assert lookup((10 << 24) + (1 << 16) + 7) == "B"
    assert lookup((10 << 24) + (1 << 16) + (2 << 8) + 9) == "C"
    assert lookup((11 << 24)) is None


def test_ip_to_int_col(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ip": ["1.2.3.4", "255.255.255.255", "0.0.0.0", "2001:db8::1", "999.1.1.1", "x", ""]})
    )
    got = [r[0] for r in df.select(ip_to_int_col(F.col("ip"))).collect()]
    assert got == [(1 << 24) + (2 << 16) + (3 << 8) + 4, 2**32 - 1, 0, None, None, None, None]


def test_enrich_geoip_matches_python_lookup(spark):
    rules = default_cidr_table()
    flat = flatten_cidrs(rules)

    def lookup(ip):
        try:
            a, b, c, d = (int(x) for x in ip.split("."))
        except ValueError:
            return None
        v = (a << 24) | (b << 16) | (c << 8) | d
        for r in flat:
            if r["start_ip"] <= v <= r["end_ip"]:
                return r["country"]
        return None

    ips = ["10.0.0.1", "10.0.0.7", "10.0.5.9", "10.1.100.3", "10.0.4.200", "2001:db8::1", "8.8.8.8"]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(map(str, range(len(ips)))), "remote_addr": ips}))
    got = {
        r["remote_addr"]: r["country"]
        for r in enrich_geoip(df, rules, spark=spark).collect()
    }
    for ip in ips:
        assert got[ip] == lookup(ip), ip
    # longest-prefix: 10.0.0.1 is inside the /30 override
    assert got["10.0.0.1"] == "AQ"


def test_enrich_geoip_row_count_stable(spark):
    """Disjoint intervals => left join can never duplicate fact rows."""
    from nginx_log_spark.datagen import loggen
    from nginx_log_spark.parse import parse_sequences

    seq = loggen.sequences_df(spark, 2000, partitions=4)
    parsed = parse_sequences(seq).filter(F.col("valid"))
    n0 = parsed.count()
    n1 = enrich_geoip(parsed, default_cidr_table(), spark=spark).count()
    assert n0 == n1


def test_ua_classify(spark):
    cases = {
        "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115.0": "browser",
        "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)": "bot",
        "curl/8.5.0": "cli",
        "python-requests/2.31": "cli",
        "AhrefsBot/7.0": "bot",
        "weird-agent/1.0": "other",
        "Mozilla/4.0 (unknown)": "browser",
    }
    df = spark.createDataFrame(pd.DataFrame({"ua": list(cases)}))
    got = dict(df.select("ua", classify_ua_col(F.col("ua")).alias("c")).collect())
    assert got == cases
