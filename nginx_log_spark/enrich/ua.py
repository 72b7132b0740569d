"""User-Agent classification (north-star addition).

The rule table is tiny, so instead of a join we COMPILE it into one chained
CASE/rlike Catalyst expression — fully JVM-side, whole-stage-codegen, zero
shuffle, and trivially broadcast as part of the plan. First match by
ascending priority wins (FIXTURES.md F5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, class, priority) — bots before browsers: bot UAs often embed
# browser tokens ("Mozilla/5.0 ... Googlebot"), so bots must match first.
DEFAULT_UA_RULES: list[tuple[str, str, int]] = [
    (r"(?i)(googlebot|bingbot|yandexbot|ahrefsbot|duckduckbot|baiduspider)", "bot", 10),
    (r"(?i)(bot|spider|crawler|slurp)", "bot", 20),
    (r"^(curl|Wget|python-requests|Apache-HttpClient|Go-http-client|okhttp)", "cli", 30),
    (r"(?i)(iphone|android).+(mobile|wv)", "mobile", 40),
    (r"(Firefox|Chrome|Safari|Edg|MSIE|Trident|Opera)", "browser", 50),
    (r"Mozilla", "browser", 60),
]


def classify_ua_col(ua: Column, rules: list[tuple[str, str, int]] | None = None) -> Column:
    rules = sorted(rules or DEFAULT_UA_RULES, key=lambda r: r[2])
    expr: Column | None = None
    for pattern, cls, _ in rules:
        cond = ua.rlike(pattern)
        expr = F.when(cond, cls) if expr is None else expr.when(cond, cls)
    assert expr is not None
    return expr.otherwise(F.lit("other"))


def enrich_ua(
    df: DataFrame,
    ua_col: str = "http_user_agent",
    out_col: str = "ua_class",
    rules: list[tuple[str, str, int]] | None = None,
) -> DataFrame:
    return df.withColumn(out_col, classify_ua_col(F.col(ua_col), rules))
