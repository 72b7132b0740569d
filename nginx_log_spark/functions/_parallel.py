"""Scale-adaptive scan fan-out.

A tiny input (one parquet row group, a single small file, a
``createDataFrame`` literal) plans as ONE scan task, so every JVM
expression before the first exchange — shingling, hashing, scoring —
runs single-threaded no matter how many cores the session has. At
warehouse scale the same plan has thousands of input splits and needs
no help; fanning out there would be a pure pessimization (a full extra
shuffle of the payload).

``ensure_parallelism`` is therefore a *guard*, not a policy: it
round-robin repartitions only when the incoming plan has at least
``factor``x fewer partitions than the session's default parallelism.
The condition is false for any real multi-split dataset, so the helper
is a no-op exactly where a repartition would hurt (guide: keep
scale-dependent settings adaptive, never tuned to the local box).
Round-robin repartition keeps Spark's sort-before-repartition retry
determinism; every consumer in this package is order-insensitive
(aggregates, joins, min/rank reductions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 4) -> DataFrame:
    """Fan a tiny scan out to the session's default parallelism.

    No-op unless the plan's partition count is < defaultParallelism /
    ``factor`` — i.e. only single-digit-split inputs are ever shuffled,
    and the shuffled payload is bounded by what a handful of scan tasks
    could hold.
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - e.g. plan not convertible
        return df
    if n * factor <= target:
        return df.repartition(target)
    return df
