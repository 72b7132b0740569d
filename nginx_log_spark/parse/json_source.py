"""JSON-format nginx log source (``log_format escape=json`` variant).

The reference tool parses only the combined TEXT format (c/main.c:413-455).
Real nginx deployments also emit the same access-log fields as one JSON
object per line (``log_format access_json escape=json ...``); this source
widens the engine's ingest surface to that variant while producing the
IDENTICAL parsed schema (``PARSED_FIELDS``), so every downstream operator
(enrich / route / report) is format-agnostic: parse_sequences and
parse_json_sequences are drop-in replacements for each other.

Plan shape (scale notes):

- tokens -> string is the SAME vectorized Arrow-batched ``decode_tokens``
  UDF the text path uses — one Python crossing, no per-row work;
- string -> fields is ``from_json`` + struct projection, pure JVM inside
  WholeStageCodegen — corrupt lines yield a null struct (PERMISSIVE), so
  reject detection is free, no second pass;
- the whole operator is a narrow projection: no shuffle, no action.

Semantics parity with the C cursor parser where they overlap:

- a row is valid only if ALL nine fields are present (the C parser fails
  the line whenever any ``parse_item_*`` combinator fails, c/main.c:413-455);
- the 3-digit status gate (c/main.c:433-437) applies to the JSON string
  value exactly as to the text run (``status_3digit=False`` gives the
  Nim/C++ any-digit-run semantics, main.nim:102-103);
- rejected rows keep their tokens untouched and null all parsed fields,
  exactly like the text path, so fan-out routing is unchanged.

One deliberate difference, documented rather than hidden: the text format
cannot carry ``"`` inside quoted fields (memchr, no escape handling —
c/main.c:92-114), while JSON can (``\\"``). parse_json_sequences recovers
such values losslessly; tests/test_json_source.py pins that behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nginx_log_spark.parse.parser import PARSED_FIELDS, decode_tokens

# the nine JSON keys, in the combined-format field order; body_bytes_sent
# is a JSON number (nginx renders $body_bytes_sent unquoted), all else strings
JSON_LOG_FIELDS: list[tuple[str, T.DataType]] = [
    (name, typ) for name, typ in PARSED_FIELDS if name != "valid"
]


def json_log_schema() -> T.StructType:
    """Schema of one ``log_format escape=json`` line."""
    return T.StructType([T.StructField(n, t, True) for n, t in JSON_LOG_FIELDS])


def json_line_expr(cols: dict[str, Column]) -> Column:
    """Render one JSON log line from field columns (to_json of a struct —
    deterministic key order = combined-format field order). Used by the
    parity fixtures and the datagen, NOT by the parser."""
    return F.to_json(
        F.struct(*[cols[name].alias(name) for name, _ in JSON_LOG_FIELDS])
    )


def parse_json_lines(
    df: DataFrame, line_col: str = "line", status_3digit: bool = True
) -> DataFrame:
    """Parse a string column of JSON log lines; adds the 9 fields + ``valid``.

    Pure JVM (from_json) — stays in WholeStageCodegen end to end.
    """
    j = F.from_json(F.col(line_col), json_log_schema())
    df = df.withColumn("_j", j)
    present = [F.col(f"_j.{name}").isNotNull() for name, _ in JSON_LOG_FIELDS]
    status_ok = (
        F.col("_j.status").rlike("^[0-9]{3}$")
        if status_3digit
        else F.col("_j.status").rlike("^[0-9]+$")
    )
    valid = status_ok
    for p in present:
        valid = valid & p
    df = df.withColumn("valid", F.coalesce(valid, F.lit(False)))
    for name, _ in JSON_LOG_FIELDS:
        df = df.withColumn(
            name, F.when(F.col("valid"), F.col(f"_j.{name}")).otherwise(F.lit(None))
        )
    return df.drop("_j")


def parse_json_sequences(
    df: DataFrame, tokens_col: str = "tokens", status_3digit: bool = True
) -> DataFrame:
    """Parse a pre-tokenized JSON-log table (doc_id, tokens, n_tok, source).

    Token arrays pass through UNTOUCHED (per-row invariant: routed output
    tokens must equal input tokens exactly) — mirror of parse_sequences.
    """
    df = df.withColumn("_line", decode_tokens(F.col(tokens_col)))
    return parse_json_lines(df, "_line", status_3digit=status_3digit).drop("_line")
