"""spark-submit packaging: the north rule's deployment shape, end to end.

Builds dist/nginx_log_spark.zip (package.py), then runs the real
`spark-submit --py-files <zip> jobs/run_pipeline.py` as a subprocess from a
SCRATCH working directory — so every `nginx_log_spark.*` import must
resolve from the zip, exactly as on a cluster — and checks the routed
sinks + metrics output.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_pipeline(spark, tmp_path):
    from nginx_log_spark.datagen import loggen

    src = str(tmp_path / "seq")
    loggen.sequences_df(spark, 2000, partitions=2).write.mode("overwrite").parquet(src)

    # build the zip via the packaging entrypoint
    out_zip = tmp_path / "nginx_log_spark.zip"
    r = subprocess.run(
        [sys.executable, str(REPO / "package.py")],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-1000:]
    shutil.copy(REPO / "dist" / "nginx_log_spark.zip", out_zip)

    job = tmp_path / "run_pipeline.py"
    shutil.copy(REPO / "jobs" / "run_pipeline.py", job)

    out = str(tmp_path / "sinks")
    workdir = tmp_path / "scratch"
    workdir.mkdir()
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="4g")
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", str(out_zip),
         str(job), "--input", src, "--output", out],
        capture_output=True, text=True, timeout=600, cwd=str(workdir), env=env,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])

    routed = spark.read.parquet(f"{out}/sink=routed")
    rejects_dir = Path(out)
    n_rejects = 0
    if (rejects_dir / "sink=rejects").exists():
        n_rejects = spark.read.parquet(f"{out}/sink=rejects").count()
    assert routed.count() + n_rejects == 2000
    # token passthrough survives the packaged run (per-row invariant)
    assert "tokens" in routed.columns
