"""Dual-dialect (Spark SQL / DuckDB) log-line rendering for the driver's
correctness gate.

The grading driver runs each ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin on the same TPC-H-ish parquet tables. To cross-check
the LOG pipeline (parse -> enrich -> route -> aggregate) through DuckDB, we
render deterministic nginx combined-format lines FROM the ``events`` table
with expressions that produce byte-identical strings in both dialects:

    Spark:  events -> render line -> encode to tokens -> parse_sequences
            -> REAL engine operators -> result
    DuckDB: events -> the same field expressions directly -> plain SQL agg

If the engine's tokenize+parse+aggregate path is correct, the two agree on
every value; any parser/aggregation bug breaks the value hash.

Dialect differences handled here: CAST target name (STRING/VARCHAR) and
timestamp formatting (date_format vs strftime — verified byte-identical for
'dd/MMM/yyyy:HH:mm:ss' vs '%d/%b/%Y:%H:%M:%S' on these tables).
"""

from __future__ import annotations

MALFORMED_MOD = 97  # ~1% of rendered lines truncated mid-time-field


def _cast_str(x: str, d: str) -> str:
    return f"CAST({x} AS {'STRING' if d == 'spark' else 'VARCHAR'})"


def field_exprs(d: str) -> dict[str, str]:
    """SQL expressions (dialect d in {'spark','duck'}) over the events table
    columns (event_id, ts, user_id, event_type, value) for every log field."""
    s = lambda x: _cast_str(x, d)
    if d == "spark":
        tloc = "date_format(ts, 'dd/MMM/yyyy:HH:mm:ss') || ' +0000'"
    else:
        tloc = "strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000'"
    e: dict[str, str] = {}
    e["doc_id"] = f"'e' || {s('event_id')}"
    e["remote_addr"] = (
        f"'10.' || {s('user_id % 200')} || '.' || {s('(user_id * 7) % 200')}"
        f" || '.' || {s('(user_id * 13) % 250 + 1')}"
    )
    e["ip_int"] = (
        "167772160 + (user_id % 200) * 65536 + ((user_id * 7) % 200) * 256"
        " + ((user_id * 13) % 250 + 1)"
    )
    e["remote_user"] = (
        "CASE WHEN user_id % 10 = 0 THEN 'alice' WHEN user_id % 10 = 5 THEN 'bob' ELSE '-' END"
    )
    e["time_local"] = tloc
    e["request"] = f"'GET /' || event_type || '/' || {s('event_id % 50')} || ' HTTP/1.1'"
    e["status"] = (
        "CASE WHEN event_id % 100 < 85 THEN '200' WHEN event_id % 100 < 91 THEN '404'"
        " WHEN event_id % 100 < 95 THEN '301' WHEN event_id % 100 < 98 THEN '500'"
        " ELSE '502' END"
    )
    e["body_bytes_sent"] = "CAST(floor(value * 100) AS BIGINT)"
    e["http_referer"] = (
        "CASE WHEN event_id % 3 = 0 THEN '' ELSE 'https://ref.example/' || event_type END"
    )
    e["http_user_agent"] = (
        "CASE user_id % 5"
        " WHEN 0 THEN 'Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115.0'"
        " WHEN 1 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64) Chrome/120.0'"
        " WHEN 2 THEN 'curl/8.5.0'"
        " WHEN 3 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'"
        " ELSE 'weird-agent/1.0' END"
    )
    e["ua_class_expected"] = (
        "CASE user_id % 5 WHEN 0 THEN 'browser' WHEN 1 THEN 'browser'"
        " WHEN 2 THEN 'cli' WHEN 3 THEN 'bot' ELSE 'other' END"
    )
    e["http_x_forwarded_for"] = (
        f"CASE WHEN event_id % 4 = 0 THEN '10.9.' || {s('user_id % 9')} || '.7' ELSE '' END"
    )
    e["source"] = (
        "CASE user_id % 4 WHEN 0 THEN 'web-01' WHEN 1 THEN 'web-02'"
        " WHEN 2 THEN 'cdn' ELSE 'edge' END"
    )
    # extended tail (c/main.c:169-212): present on ~half the lines
    e["has_tail"] = "user_id % 2 = 0"
    e["host"] = f"CASE WHEN user_id % 2 = 0 THEN 'srv-' || {s('user_id % 3')} || '.example.com' END"
    e["request_length"] = f"CASE WHEN user_id % 2 = 0 THEN {s('event_id % 1000 + 100')} END"
    e["bytes_sent"] = f"CASE WHEN user_id % 2 = 0 THEN {s('event_id % 5000 + 200')} END"
    e["upstream_addr"] = (
        f"CASE WHEN user_id % 2 = 0 THEN '10.8.' || {s('user_id % 7')} || '.1:8080' END"
    )
    e["upstream_status"] = (
        "CASE WHEN user_id % 2 = 0 THEN (CASE WHEN event_id % 20 = 0 THEN '-' ELSE '502' END) END"
    )
    e["request_time"] = f"CASE WHEN user_id % 2 = 0 THEN '0.' || {s('event_id % 900 + 100')} END"
    e["upstream_response_time"] = (
        "CASE WHEN user_id % 2 = 0 THEN (CASE WHEN event_id % 20 = 0 THEN '-' "
        f"ELSE '0.' || {s('event_id % 800 + 100')} END) END"
    )
    e["upstream_connect_time"] = (
        f"CASE WHEN user_id % 2 = 0 THEN '0.' || {s('event_id % 70 + 10')} END"
    )
    e["upstream_header_time"] = (
        f"CASE WHEN user_id % 2 = 0 THEN '0.' || {s('event_id % 60 + 10')} END"
    )
    tail = (
        f"CASE WHEN user_id % 2 = 0 THEN ' ' || {e['host']} || ' ' || {e['request_length']}"
        f" || ' ' || {e['bytes_sent']} || ' ' || {e['upstream_addr']}"
        f" || ' ' || {e['upstream_status']} || ' ' || {e['request_time']}"
        f" || ' ' || {e['upstream_response_time']} || ' ' || {e['upstream_connect_time']}"
        f" || ' ' || {e['upstream_header_time']} ELSE '' END"
    )
    e["ext_tail"] = tail
    good = (
        f"{e['remote_addr']} || ' - ' || {e['remote_user']} || ' [' || {e['time_local']}"
        f" || '] \"' || {e['request']} || '\" ' || {e['status']} || ' '"
        f" || {s(e['body_bytes_sent'])} || ' \"' || {e['http_referer']}"
        f" || '\" \"' || {e['http_user_agent']} || '\" \"' || {e['http_x_forwarded_for']} || '\"'"
    )
    e["good_line"] = good
    e["good_line_ext"] = f"({good}) || ({tail})"
    # truncation always cuts inside/before the [time] field => always rejected
    e["line"] = f"CASE WHEN event_id % {MALFORMED_MOD} = 0 THEN substr({good}, 1, 20) ELSE {good} END"
    e["line_ext"] = (
        f"CASE WHEN event_id % {MALFORMED_MOD} = 0 THEN substr({good}, 1, 20)"
        f" ELSE ({good}) || ({tail}) END"
    )
    e["valid"] = f"event_id % {MALFORMED_MOD} <> 0"
    e["status_class"] = f"substr({e['status']}, 1, 1) || 'xx'"
    return e


def events_with_log_columns(spark, sf_dir: str):
    """Spark side: events + rendered line/tokens + routing columns.

    Goes through the REAL token path: render -> encode_lines (pandas UDF)
    -> array<int32> tokens, exactly the BASELINE.json input shape.
    """
    from pyspark.sql import functions as F

    from nginx_log_spark.functions._parallel import ensure_parallelism
    from nginx_log_spark.parse.parser import encode_lines

    e = field_exprs("spark")
    # fan-out guard: the fixture parquet is a single split, which would
    # serialize the whole render -> encode -> parse chain in one task
    ev = ensure_parallelism(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return (
        ev.withColumn("doc_id", F.expr(e["doc_id"]))
        .withColumn("line", F.expr(e["line"]))
        .withColumn("source", F.expr(e["source"]))
        .withColumn("tokens", encode_lines(F.col("line")))
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


def parsed_log_df(spark, sf_dir: str):
    """The full engine path: tokens -> parse_sequences (the graded operator)."""
    from nginx_log_spark.parse import parse_sequences

    seq = events_with_log_columns(spark, sf_dir).select(
        "doc_id", "tokens", "n_tok", "source"
    )
    return parse_sequences(seq)


def events_with_json_log_columns(spark, sf_dir: str):
    """JSON-format (``log_format escape=json``) twin of
    events_with_log_columns: the SAME fields rendered as one JSON object per
    line, same ~1% deterministic truncation (a 20-char prefix of a JSON
    object is always corrupt), same token encoding."""
    from pyspark.sql import functions as F

    from nginx_log_spark.functions._parallel import ensure_parallelism
    from nginx_log_spark.parse.json_source import JSON_LOG_FIELDS, json_line_expr
    from nginx_log_spark.parse.parser import encode_lines

    e = field_exprs("spark")
    # same single-split fan-out guard as events_with_log_columns
    ev = ensure_parallelism(spark.read.parquet(f"{sf_dir}/events.parquet"))
    cols = {name: F.expr(e[name]).cast(t) for name, t in JSON_LOG_FIELDS}
    good = json_line_expr(cols)
    line = F.when(
        F.expr(f"event_id % {MALFORMED_MOD} = 0"), F.substring(good, 1, 20)
    ).otherwise(good)
    return (
        ev.withColumn("doc_id", F.expr(e["doc_id"]))
        .withColumn("line", line)
        .withColumn("source", F.expr(e["source"]))
        .withColumn("tokens", encode_lines(F.col("line")))
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )


def parsed_json_log_df(spark, sf_dir: str):
    """Engine path over the JSON source: tokens -> parse_json_sequences."""
    from nginx_log_spark.parse.json_source import parse_json_sequences

    seq = events_with_json_log_columns(spark, sf_dir).select(
        "doc_id", "tokens", "n_tok", "source"
    )
    return parse_json_sequences(seq)


def parsed_ext_log_df(spark, sf_dir: str):
    """Extended-tail variant of the engine path."""
    from pyspark.sql import functions as F

    from nginx_log_spark.parse import parse_sequences
    from nginx_log_spark.parse.parser import encode_lines

    e = field_exprs("spark")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    seq = (
        ev.withColumn("doc_id", F.expr(e["doc_id"]))
        .withColumn("line", F.expr(e["line_ext"]))
        .withColumn("source", F.expr(e["source"]))
        .withColumn("tokens", encode_lines(F.col("line")))
        .withColumn("n_tok", F.size("tokens").cast("int"))
        .select("doc_id", "tokens", "n_tok", "source")
    )
    return parse_sequences(seq, extended=True)


def duck_ext_cte() -> str:
    """DuckDB CTE with the rendered extended-tail expectations."""
    e = field_exprs("duck")
    cols = ", ".join(
        f"{e[name]} AS {name}"
        for name in (
            "doc_id", "valid", "request", "host", "request_length",
            "bytes_sent", "upstream_addr", "upstream_status", "request_time",
            "upstream_response_time", "upstream_connect_time",
            "upstream_header_time",
        )
    )
    return f"WITH logs AS (SELECT {cols} FROM events)"


def duck_base_cte() -> str:
    """DuckDB CTE exposing the same rendered fields off the events view."""
    e = field_exprs("duck")
    cols = ", ".join(
        f"{expr} AS {name}"
        for name, expr in e.items()
        if name
        in (
            "doc_id",
            "remote_addr",
            "ip_int",
            "remote_user",
            "time_local",
            "request",
            "status",
            "body_bytes_sent",
            "http_referer",
            "http_user_agent",
            "ua_class_expected",
            "http_x_forwarded_for",
            "source",
            "line",
            "valid",
            "status_class",
        )
    )
    return f"WITH logs AS (SELECT {cols} FROM events)"
