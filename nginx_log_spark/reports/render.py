"""Terminal report renderer — output parity with the reference CLI.

Reproduces the reference's report layout (c/main.c:485-523): header totals,
eight count tables, the bytes table, and per-bad-code sections, each with
top-100 rows, percentages to 2dp, and the coverage footer. Runs driver-side
on the collected top-K rows (<= a few hundred), so cost is nil.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

_UNITS = "KMGTPEZY"  # c/main.c:216


def byte_format(s: int) -> str:
    """1024-base humanization, 2 decimals (c/main.c:214-230)."""
    if s < 1024:
        return f"{int(s)} B"
    n = float(s)
    i = -1
    while n >= 1024:
        n /= 1024
        i += 1
    return f"{n:.2f} {_UNITS[i]}B"


_BLUE = "\x1b[1;34m"
_GREEN = "\x1b[1;32m"
_RED = "\x1b[1;31m"
_RST = "\x1b[00m"

REPORT_TITLES = {
    "top_ips": "来访IP统计",
    "top_users": "用户统计",
    "top_xff": "代理IP统计",
    "top_requests": "HTTP请求统计",
    "top_uas": "User-Agent统计",
    "top_referers": "HTTP REFERER 统计",
    "top_times": "请求时间统计",
    "status_counts": "HTTP响应状态统计",
    "bytes_by_request": "HTTP流量占比统计",
}


def _width() -> int:
    return max(shutil.get_terminal_size((96, 24)).columns - 16, 20)


def render_header(totals_row) -> str:
    sent = byte_format(int(totals_row["total_bytes_sent"] or 0))
    return (
        f"\n共计{_BLUE}{totals_row['total_lines']}{_RST}次访问\n"
        f"发送总流量{_GREEN}{sent}{_RST}\n"
        f"独立IP数{_RED}{totals_row['unique_ips']}{_RST}\n"
    )


def render_count_table(title: str, rows, total_lines: int, distinct: int, width: int | None = None) -> str:
    w = width or _width()
    out = [f"\n{_BLUE}{title}{_RST}"]
    covered = 0
    for r in rows:
        key, cnt, pct = r[0], r[1], r[2]
        covered += cnt
        out.append(f"{str(key)[:w]:<{w}} {cnt:6d} {pct:.2f}%")
    cov_pct = covered / total_lines * 100 if total_lines else 0.0
    out.append(f"前100项占比\n{f'{covered}/{total_lines}':<{w}} {distinct:6d} {cov_pct:.2f}%\n")
    return "\n".join(out)


def render_bytes_table(title: str, rows, total_bytes: int, distinct: int, width: int | None = None) -> str:
    w = (width or _width()) - 6
    out = [f"\n{_BLUE}{title}{_RST}"]
    covered = 0
    for r in rows:
        key, nbytes, pct = r[0], int(r[1]), r[2]
        covered += nbytes
        out.append(f"{str(key)[:w]:<{w}} {byte_format(nbytes):>12} {pct:.2f}%")
    cov_pct = covered / total_bytes * 100 if total_bytes else 0.0
    footer_key = f"{byte_format(covered)}/{byte_format(total_bytes)}"
    out.append(f"前100项占比\n{footer_key:<{w}} {distinct:12d} {cov_pct:.2f}%\n")
    return "\n".join(out)


def render_bad_code_section(status: str, hits: int, pct: float, rows, width: int | None = None) -> str:
    w = width or _width()
    out = [f"\n{_BLUE}状态码{int(status)},共{hits}次,占比{pct:.2f}%{_RST}"]
    covered = 0
    for r in rows:
        covered += r["cnt"]
        out.append(f"{str(r['request'])[:w]:<{w}} {r['cnt']:6d} {r['pct_of_section']:.2f}%")
    cov_pct = covered / hits * 100 if hits else 0.0
    out.append(f"前100项占比\n{f'{covered}/{hits}':<{w}} {len(rows):6d} {cov_pct:.2f}%\n")
    return "\n".join(out)


def render_full_report(parsed: DataFrame, k: int = 100) -> str:
    """Collect every report off one cached parsed DF and render the full
    reference-ordered text report (c/main.c:499-523 print order)."""
    from nginx_log_spark.reports.reports import (
        REPORT_KEYS,
        bad_code_breakdown,
        bad_code_sections,
        bytes_by_request,
        top_counts,
        totals,
    )

    parsed = parsed.cache()
    try:
        tot = totals(parsed).collect()[0]
        total_lines = tot["total_lines"]
        total_bytes = int(tot["total_bytes_sent"] or 0)
        pieces = [render_header(tot)]
        if total_lines < 1:
            return "".join(pieces)
        order = [
            "top_ips",
            "top_users",
            "top_xff",
            "top_requests",
            "top_uas",
            "top_referers",
            "top_times",
            "status_counts",
        ]
        # distinct-key counts for the footers (reference prints table size)
        distincts = {
            name: parsed.select(REPORT_KEYS[name]).distinct().count() for name in order
        }
        for name in order:
            rows = top_counts(parsed, REPORT_KEYS[name], k).collect()
            pieces.append(
                render_count_table(REPORT_TITLES[name], rows, total_lines, distincts[name])
            )
        byt = bytes_by_request(parsed, k).collect()
        n_req = distincts["top_requests"]
        pieces.append(
            render_bytes_table(REPORT_TITLES["bytes_by_request"], byt, total_bytes, n_req)
        )
        sections = bad_code_sections(parsed).collect()
        detail = bad_code_breakdown(parsed, k).collect()
        by_status: dict[str, list] = {}
        for r in detail:
            by_status.setdefault(r["status"], []).append(r)
        for s in sections:
            pieces.append(
                render_bad_code_section(
                    s["status"], s["hits"], s["pct"], by_status.get(s["status"], [])
                )
            )
        return "\n".join(pieces)
    finally:
        parsed.unpersist()
