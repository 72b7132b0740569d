"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's 来访IP统计 / top-IPs
report, c/main.c:499) end-to-end through the engine's token path at
sf0.001. ``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 with a DuckDB twin — see nginx_log_spark/driver_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize rendered log lines -> byte-parity parse ->
    top-100 IPs with hit counts and percentage (sf0.001 smoke)."""
    from nginx_log_spark.driver_queries import log_top_ips

    return log_top_ips(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nginx_log_spark import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    from nginx_log_spark import driver_queries

    return driver_queries.oracle_sql()
