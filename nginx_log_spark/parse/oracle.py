"""Pure-Python oracle of the reference parser semantics (TEST-ONLY).

This is a behavioral re-derivation of the C cursor combinators in
/root/reference/c/main.c:47-114 (``parse_item_trim_space`` /
``parse_item_wrap_string``) and the 9-field accept loop at
c/main.c:407-455, used only to cross-check the vectorized Spark parser in
tests. It is intentionally slow and readable; the engine never imports it.

Semantics frozen here (each with its citation):
- trim_space(cond): skip ASCII 0x20 spaces; take the maximal run of chars
  satisfying cond(cur, prev); FAIL if the run is empty; the single char that
  terminated the run is CONSUMED; trailing spaces are skipped
  (c/main.c:47-90 — note pos advances past the failing char before the
  trailing-space loop at c/main.c:82-85).
- wrap(l, r): skip spaces; require l; value runs to the FIRST r (memchr —
  no escape handling, c/main.c:104); empty value is valid; cursor past r
  (c/main.c:92-114).
- remote_user skips any run of '-' BEFORE the space-skip (c/main.c:121-132).
- status must be exactly 3 digits (c/main.c:433-437, C-only divergence we
  adopt as canonical).
- body_bytes_sent = atoi(digit run) (c/main.c:443).
- Any field failing => whole line rejected (c/main.c:413-455).
"""

from __future__ import annotations

from typing import Callable

CharCond = Callable[[str, str], bool]


def digital(x: str, y: str) -> bool:
    return "0" <= x <= "9"


def digital_dot(x: str, y: str) -> bool:
    return "0" <= x <= "9" or x == "."


def digital_dot_colon(x: str, y: str) -> bool:
    # chr 48..58 inclusive (digits + ':'), '.', 'a'..'f' — c/main.c:24-27
    return "0" <= x <= ":" or x == "." or "a" <= x <= "f"


def digital_dot_minus(x: str, y: str) -> bool:
    return "0" <= x <= "9" or x in ".-"


def not_space(x: str, y: str) -> bool:
    return x != " "


def digital_or_none_end(x: str, y: str) -> bool:
    # stop only at a space whose previous char is a digit or '-' — c/main.c:42-45
    return not (x == " " and ("0" <= y <= "9" or y == "-"))


def trim_space(s: str, pos: int, cond: CharCond) -> tuple[str | None, int]:
    """Return (value, new_pos); value None on failure (pos then unchanged
    past the leading-space skip, like the C -1 path)."""
    n = len(s)
    while pos < n and s[pos] == " ":
        pos += 1
    start = -1
    last = -1
    y = s[pos - 1] if pos > 0 else "\0"
    i = pos
    while i < n:
        x = s[i]
        i += 1
        if cond(x, y):
            y = x
            last = i - 1
            if start < 0:
                start = last
            if i < n:
                continue
            # matched the final char: emit below with nothing consumed after
        elif start < 0:
            return None, pos
        val = s[start : last + 1]
        while i < n and s[i] == " ":
            i += 1
        return val, i
    return None, pos  # empty region (pos == n at entry)


def wrap(s: str, pos: int, left: str, right: str) -> tuple[str | None, int]:
    n = len(s)
    while pos < n and s[pos] == " ":
        pos += 1
    if pos >= n or s[pos] != left:
        return None, pos
    pos += 1
    j = s.find(right, pos)
    if j < 0:
        return None, pos
    return s[pos:j], j + 1


CORE_FIELDS = (
    "remote_addr",
    "remote_user",
    "time_local",
    "request",
    "status",
    "body_bytes_sent",
    "http_referer",
    "http_user_agent",
    "http_x_forwarded_for",
)

EXT_FIELDS = (
    "host",
    "request_length",
    "bytes_sent",
    "upstream_addr",
    "upstream_status",
    "request_time",
    "upstream_response_time",
    "upstream_connect_time",
    "upstream_header_time",
)


def parse_line(s: str) -> dict | None:
    """Parse the 9 core fields; None if the reference would reject the line."""
    pos = 0
    out: dict = {}

    v, pos = trim_space(s, pos, digital_dot_colon)
    if v is None:
        return None
    out["remote_addr"] = v

    n = len(s)
    while pos < n and s[pos] == "-":  # '-'-skip precedes the space-skip
        pos += 1
    v, pos = trim_space(s, pos, not_space)
    if v is None:
        return None
    out["remote_user"] = v

    v, pos = wrap(s, pos, "[", "]")
    if v is None:
        return None
    out["time_local"] = v

    v, pos = wrap(s, pos, '"', '"')
    if v is None:
        return None
    out["request"] = v

    v, pos = trim_space(s, pos, digital)
    if v is None or len(v) != 3:
        return None
    out["status"] = v

    v, pos = trim_space(s, pos, digital)
    if v is None:
        return None
    out["body_bytes_sent"] = int(v)

    for f in ("http_referer", "http_user_agent", "http_x_forwarded_for"):
        v, pos = wrap(s, pos, '"', '"')
        if v is None:
            return None
        out[f] = v
    return out


def parse_extended_tail(s: str, pos: int) -> dict:
    """Extended tail parsers (defined in the reference but not wired into its
    main loop — c/main.c:169-212). All nullable; parse as far as possible."""
    out: dict = dict.fromkeys(EXT_FIELDS)
    conds: list[tuple[str, CharCond]] = [
        ("host", not_space),
        ("request_length", digital),
        ("bytes_sent", digital),
        ("upstream_addr", not_space),
        ("upstream_status", digital_or_none_end),
        ("request_time", digital_dot),
        ("upstream_response_time", digital_dot_minus),
        ("upstream_connect_time", digital_dot_minus),
        ("upstream_header_time", digital_dot_minus),
    ]
    for name, cond in conds:
        v, pos = trim_space(s, pos, cond)
        if v is None:
            break
        out[name] = v
    return out
