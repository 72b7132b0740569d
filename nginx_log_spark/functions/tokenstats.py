"""Token-array statistics computed directly on the ``tokens`` payload
(the BASELINE.json input shape) — no decode, no Python.

The reference never looks at byte distributions (it parses and discards,
c/main.c:407-478); these operators serve the training-pipeline side of the
engine: per-sequence byte/token entropy is a standard cheap quality signal
(compressed/binary junk scores near ln(256); natural text sits ~ln(40)).

Scale shape: the per-doc entropy is a chain of JVM higher-order functions
over the sorted token array — O(n log n) per row, embarrassingly parallel,
NO shuffle, whole-stage codegen throughout. Only the ~600-row bucket
histogram aggregates.

Determinism discipline (the repo's integer fixed-point rule): run counts
are integers; Σ c·round(ln(c)·1e6) is an exact integer sum, so the per-doc
entropy and its bucket are partition-order independent and byte-identical
to the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_entropy_e6(tokens_col: str = "tokens") -> Column:
    """Shannon entropy (nats, fixed-pointed ·1e6) of a token array's value
    distribution:  H = ln(n) - (Σ_v c_v·ln(c_v)) / n.  NULL for empty.

    Run-length trick: sort the array, find run boundaries, diff them —
    counts per distinct token value with no per-doc map and no shuffle.
    Spark SQL has no let-binding inside expressions, so the sorted array
    ``s`` and the boundary array ``b`` are bound as lambda variables of
    1-element ``transform`` wrappers — each is computed exactly ONCE
    (inlining them would re-sort per element access, O(n^2 log n))."""
    return F.expr(
        f"""CASE WHEN size({tokens_col}) > 0 THEN
          transform(array(array_sort({tokens_col})), s ->
            transform(array(filter(sequence(0, size(s) - 1),
                                   i -> i = 0 OR s[i] != s[i - 1])), b ->
              CAST(round(
                ln(CAST(size(s) AS DOUBLE)) * 1e6
                - aggregate(
                    transform(sequence(0, size(b) - 1),
                              j -> IF(j = size(b) - 1,
                                      size(s) - b[j],
                                      b[j + 1] - b[j])),
                    CAST(0 AS LONG),
                    (acc, c) -> acc + c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS LONG)
                  ) / CAST(size(s) AS DOUBLE)
              ) AS LONG)
            )[0]
          )[0]
        END"""
    )


def doc_entropy_histogram(
    df: DataFrame, tokens_col: str = "tokens", bucket_e6: int = 100_000
) -> DataFrame:
    """Histogram of per-doc token entropy in ``bucket_e6``-nat·1e6 buckets
    (default 0.1 nat). Per-doc work is shuffle-free JVM lambdas; the only
    aggregation is over the few-hundred bucket keys."""
    return (
        df.filter(F.size(tokens_col) > 0)
        .select(F.floor(token_entropy_e6(tokens_col) / F.lit(bucket_e6)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
