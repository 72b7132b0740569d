from nginx_log_spark.parse.parser import (  # noqa: F401
    CORE_PATTERN,
    PARSED_FIELDS,
    decode_tokens,
    parse_lines,
    parse_sequences,
    parsed_schema,
)
