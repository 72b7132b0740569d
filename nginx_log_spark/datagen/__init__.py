from nginx_log_spark.datagen.loggen import (  # noqa: F401
    fields_for_ids,
    golden_pandas,
    render_lines,
    sequences_pandas,
    write_sequences,
)
