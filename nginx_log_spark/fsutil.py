"""Filesystem helpers that work on WHATEVER filesystem the job's paths
live on (local, HDFS, S3A, ...), via the Hadoop FileSystem API already
inside the Spark JVM.

Why this exists: resume markers and index probes written with
``pathlib.Path`` only see the DRIVER'S local disk. On a cluster whose
stage outputs live on HDFS/S3, a local-path ``_SUCCESS`` check is always
False, so a restarted job re-runs completed stages — and for the
incremental-dedup stage that silently empties the output (the batch's
digests are already in the index). Probing through
``org.apache.hadoop.fs`` keeps the markers on the SAME filesystem as the
data they guard.

The read-or-empty helper also replaces the bare ``except Exception``
pattern around ``spark.read.parquet``: a transient FS fault or corrupt
footer must NOT be mistaken for "no history yet" (that would silently
re-admit duplicates). Existence is probed explicitly; only a genuinely
absent or empty-dataset path falls back to the supplied schema, and the
empty-dataset case is matched by its specific AnalysisException.
"""

from __future__ import annotations

from typing import Any

__all__ = ["hadoop_fs", "path_exists", "mark_dir", "read_parquet_or_empty"]


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for `path`, resolved on path's OWN filesystem
    (scheme-aware: file://, hdfs://, s3a://, ...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark, path: str) -> bool:
    fs, hpath = hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def mark_dir(spark, path: str) -> None:
    """Create a marker directory (idempotent) on path's filesystem."""
    fs, hpath = hadoop_fs(spark, path)
    fs.mkdirs(hpath)


def read_parquet_or_empty(spark, path: str, schema: Any):
    """Read a parquet dataset; an ABSENT path or a committed-but-empty
    dataset (only ``_SUCCESS``, no part files — a legitimate outcome of a
    fully-deduped batch) yields an empty frame with `schema`. Any OTHER
    failure (transient FS fault, corrupt footer, permissions) propagates:
    treating it as empty history would corrupt downstream dedup."""
    if not path_exists(spark, path):
        return spark.createDataFrame([], schema)
    try:
        return spark.read.parquet(path)
    except Exception as exc:  # narrow: only the no-schema empty-dir case
        from pyspark.errors import AnalysisException

        if isinstance(exc, AnalysisException):
            # Prefer the stable error CLASS over message wording (which
            # Spark rewords across versions); fall back to the message
            # substrings only when no error class is attached. Matching
            # stays tight: a DIFFERENT attached class always re-raises.
            try:
                err_class = exc.getErrorClass()
            except Exception:
                err_class = None
            msg = str(exc)
            if err_class == "UNABLE_TO_INFER_SCHEMA" or (
                err_class is None
                and ("UNABLE_TO_INFER_SCHEMA" in msg or "Unable to infer schema" in msg)
            ):
                return spark.createDataFrame([], schema)
        raise
