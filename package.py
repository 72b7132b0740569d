#!/usr/bin/env python
"""Build dist/nginx_log_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent


def build(out: Path | None = None) -> Path:
    out = out or ROOT / "dist" / "nginx_log_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "nginx_log_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
