"""JSON-format log source (parse/json_source.py).

Pins: field recovery incl. JSON-escaped quotes (which the combined text
format cannot carry — c/main.c:92-114 memchr has no escape handling),
reject semantics (corrupt JSON, missing keys, status gates), token
pass-through, and cross-format field agreement with the text parser on
the shared parity fixture.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nginx_log_spark import parity
from nginx_log_spark.parse.json_source import (
    parse_json_lines,
    parse_json_sequences,
)

GOOD = {
    "remote_addr": "10.1.2.3",
    "remote_user": "-",
    "time_local": "17/Aug/2026:10:00:00 +0000",
    "request": "GET /a/1 HTTP/1.1",
    "status": "200",
    "body_bytes_sent": 123,
    "http_referer": "",
    "http_user_agent": 'quoted "agent" \\ backslash',
    "http_x_forwarded_for": "",
}


def _df_from_lines(spark, lines):
    return spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "id int, line string")


def test_parse_json_lines_field_recovery(spark):
    row = parse_json_lines(_df_from_lines(spark, [json.dumps(GOOD)])).collect()[0]
    assert row.valid
    for k, v in GOOD.items():
        assert getattr(row, k) == v, k
    # the escaped quote survived — impossible in the combined text format
    assert '"agent"' in row.http_user_agent


@pytest.mark.parametrize(
    "mutate, why",
    [
        (lambda d: json.dumps(d)[:20], "truncated / corrupt JSON"),
        (lambda d: json.dumps({k: v for k, v in d.items() if k != "request"}),
         "missing key (C fails the line when any combinator fails)"),
        (lambda d: json.dumps({**d, "status": "2004"}),
         "status gate: 4-digit run rejects (c/main.c:433-437)"),
        (lambda d: json.dumps({**d, "status": None}), "null status"),
        (lambda d: "", "empty line"),
    ],
)
def test_parse_json_lines_rejects(spark, mutate, why):
    row = parse_json_lines(_df_from_lines(spark, [mutate(dict(GOOD))])).collect()[0]
    assert not row.valid, why
    assert row.remote_addr is None and row.status is None, why


def test_any_digit_status_mode(spark):
    line = json.dumps({**GOOD, "status": "2004"})
    df = _df_from_lines(spark, [line])
    assert not parse_json_lines(df).collect()[0].valid
    relaxed = parse_json_lines(df, status_3digit=False).collect()[0]
    assert relaxed.valid and relaxed.status == "2004"


def test_parse_json_sequences_token_passthrough(spark):
    from nginx_log_spark.parse.parser import encode_lines

    lines = [json.dumps(GOOD), json.dumps(GOOD)[:20]]
    seq = (
        _df_from_lines(spark, lines)
        .withColumn("tokens", encode_lines(F.col("line")))
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select(F.col("id").cast("string").alias("doc_id"), "tokens", "n_tok")
    )
    out = parse_json_sequences(seq).orderBy("doc_id").collect()
    # per-row invariant: tokens ride through untouched on accept AND reject
    for row, line in zip(out, lines):
        assert bytes(row.tokens).decode("latin-1") == line
    assert out[0].valid and not out[1].valid


def test_cross_format_agreement(spark, sf_dir):
    """Same events, independently rendered as text and JSON, parse to
    identical field values row-for-row (the driver composite's invariant)."""
    fields = [
        "remote_addr", "remote_user", "time_local", "request", "status",
        "body_bytes_sent", "http_referer", "http_user_agent",
        "http_x_forwarded_for", "valid",
    ]
    t = parity.parsed_log_df(spark, sf_dir).select("doc_id", *fields)
    j = parity.parsed_json_log_df(spark, sf_dir).select("doc_id", *fields)
    assert t.count() == j.count()
    mismatch = (
        t.alias("t")
        .join(j.alias("j"), "doc_id", "full_outer")
        .where(
            " OR ".join(
                f"NOT (t.{f} <=> j.{f})" for f in fields
            )
        )
        .count()
    )
    assert mismatch == 0


def test_json_plan_is_jvm_side(spark):
    """from_json + projection must not introduce a Python stage beyond the
    single token-decode UDF (the same crossing the text path pays)."""
    df = _df_from_lines(spark, [json.dumps(GOOD)])
    plan = parse_json_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
