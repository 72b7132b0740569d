"""CLI with the reference's UX: analyze a log and print the report.

    python -m nginx_log_spark.cli access.log          # raw nginx text log
    python -m nginx_log_spark.cli sequences.parquet   # tokenized table
    cat access.log | python -m nginx_log_spark.cli -  # stdin (like the C tool)

Prints the reference-ordered report (totals, top-100 tables, bad-code
sections) — the Spark analogue of c/main.c:485-523.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nginx_log_spark")
    ap.add_argument("path", help="raw log file, sequences parquet dir/file, or - for stdin")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--top", type=int, default=100)
    ap.add_argument("--width", type=int, default=None,
                    help="key column width (default: terminal width - 16, like the C tool)")
    ap.add_argument("--no-color", action="store_true", help="strip ANSI colors")
    ap.add_argument("--no-echo", action="store_true",
                    help="skip the stderr echo of rejected lines")
    ap.add_argument("--paths", action="store_true",
                    help="extension: append the top method/path table")
    ap.add_argument("--bursts", action="store_true",
                    help="extension: append per-minute 5xx burst z-scores")
    ap.add_argument("--any-digit-status", action="store_true",
                    help="accept any digit-run status like the Nim/C++ reference "
                         "variants (default: the C tool's exact-3-digit gate)")
    args = ap.parse_args(argv)

    from nginx_log_spark.parse import parse_lines, parse_sequences, read_log_lines
    from nginx_log_spark.reports.render import render_full_report
    from nginx_log_spark.session import get_spark

    spark = get_spark(app="nginx_log_spark-cli", master=args.master)
    path = args.path
    tmp = None
    if path == "-":
        tmp = tempfile.NamedTemporaryFile("w", suffix=".log", delete=False)
        tmp.write(sys.stdin.read())
        tmp.close()
        path = tmp.name

    s3 = not args.any_digit_status
    if path.endswith(".parquet") or _is_parquet_dir(path):
        parsed = parse_sequences(spark.read.parquet(path), status_3digit=s3)
    else:
        # read_log_lines handles rotated .gz/.bz2 logs and restores parse
        # parallelism when a non-splittable codec caps the scan width
        parsed = parse_lines(read_log_lines(spark, path), status_3digit=s3)

    # stderr echo of rejected lines, c/main.c:480-483 (doc_id for token input).
    # toLocalIterator streams one partition at a time — bounded driver memory
    # even when most of a huge input is rejected (the reference streams too).
    if not args.no_echo:
        echo_col = "line" if "line" in parsed.columns else "doc_id"
        for r in parsed.filter(~F.col("valid")).select(echo_col).toLocalIterator():
            print(r[0], file=sys.stderr)

    valid = parsed.filter(F.col("valid"))
    sys.stdout.write(
        render_full_report(valid, k=args.top, width=args.width, color=not args.no_color)
    )
    # extension reports (off by default — the parity output above stays
    # byte-identical to the C tool, tests/test_golden_c.py)
    if args.paths or args.bursts:
        from nginx_log_spark.reports.reports import error_burst_zscore, method_path_stats

        if args.paths:
            # driver-sized by construction: method_path_stats limits to
            # --top rows before this toPandas (and the burst frame below
            # is limit(args.top)) — keep any new report on this invariant
            pdf = method_path_stats(valid, args.top).toPandas()
            sys.stdout.write("\n== method/path (extension) ==\n")
            sys.stdout.write(pdf.to_string(index=False) + "\n")
        if args.bursts:
            pdf = (
                error_burst_zscore(valid)
                .orderBy(F.desc("z")).limit(args.top).toPandas()
            )
            sys.stdout.write("\n== 5xx burst z-scores (extension) ==\n")
            sys.stdout.write(pdf.to_string(index=False) + "\n")
    sys.stdout.flush()
    spark.stop()
    return 0


def _is_parquet_dir(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        n.endswith(".parquet") or n == "_SUCCESS" for n in os.listdir(path)
    )


if __name__ == "__main__":
    raise SystemExit(main())
