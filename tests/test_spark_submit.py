"""Deployment-path test: the north rule ships via ``spark-submit
--py-files`` on a multi-executor cluster. This runs the REAL flow — build
the zip artifact, copy the job script elsewhere, spark-submit it from a
foreign cwd so the package can only resolve from the zip — against a tiny
synthesized source table on a local master."""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_job(spark, tmp_path):
    from pygraphblas_spark.sources.codegraph import synthesize_source_table

    src = str(tmp_path / "src.parquet")
    synthesize_source_table(spark, 200, seed=11).write.parquet(src)

    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "package_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    job = str(tmp_path / "job.py")
    shutil.copy(os.path.join(ROOT, "examples", "pagerank_job.py"), job)

    ranks = str(tmp_path / "ranks")
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            job,
            "--source",
            src,
            "--output",
            ranks,
            "--checkpoint",
            str(tmp_path / "ck"),
            "--max-iters",
            "8",
        ],
        cwd=str(tmp_path),  # foreign cwd: the package must come from the zip
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    df = spark.read.parquet(ranks)
    assert df.count() > 0
    assert abs(df.agg({"rank": "sum"}).first()[0] - 1.0) < 1e-6
