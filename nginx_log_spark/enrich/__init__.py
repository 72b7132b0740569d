from nginx_log_spark.enrich.geoip import (  # noqa: F401
    default_cidr_table,
    enrich_geoip,
    flatten_cidrs,
    ip_to_int_col,
)
from nginx_log_spark.enrich.ua import DEFAULT_UA_RULES, classify_ua_col, enrich_ua  # noqa: F401
