"""End-to-end drive of the production deployment path the north rule
names: ``spark-submit --py-files crawler_spark.zip jobs/crawl_job.py``
(reference run shape: crawler is launched as one long-lived process,
app/api/crawl/route.ts; here the cluster entrypoint is the submit job).

The job file is STAGED OUTSIDE the repo and submitted from a scratch
cwd, so the only way ``crawler_spark`` can resolve — driver and
executors both — is the ``--py-files`` zip, exactly like a real
cluster where the package is shipped, not checked out. Verification
reads the job's parquet outputs with pyarrow (no second SparkSession
alongside the subprocess JVM) and pins them to the sequential oracle:
the full DFS visit order, the error set, and the claims-narrowed
image+caption download set."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "fixtures", "t-smoke")
SPARK_SUBMIT = shutil.which(
    "spark-submit", path=os.environ.get("PATH", "") + os.pathsep +
    "/opt/spark/bin")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_e2e(tmp_path):
    zpath = str(tmp_path / "crawler_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "crawler_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "crawl_job.py"),
                stage / "crawl_job.py")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")

    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--driver-memory", "4g",
         "--py-files", zpath,
         str(stage / "crawl_job.py"),
         "--web", FIXDIR, "--ckpt", ck, "--out", out,
         "--max-depth", "3", "--ingest-images"],
        cwd=str(stage), env=env,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.oracle.simulator import run_oracle
    o = run_oracle(FIXDIR, CrawlConfig(max_depth=3))

    visits = pq.read_table(os.path.join(out, "visits")).to_pylist()
    got = sorted(((r["visit_rank"], r["url"], r["prio"], r["batch_id"])
                  for r in visits))
    exp = sorted(((v.rank, v.url, v.prio, v.batch_id) for v in o.visits))
    assert got == exp

    errs = pq.read_table(os.path.join(out, "errors")).to_pylist()
    assert {e["url"] for e in errs} == {e["url"] for e in o.errors}

    imgs = pq.read_table(os.path.join(out, "images")).to_pylist()
    exp_imgs = {im["src"] for im in o.images}
    assert {r["src"] for r in imgs} == exp_imgs
    assert all(r["valid"] for r in imgs)
    caps = pq.read_table(os.path.join(out, "image_captions")).to_pylist()
    assert {r["src"] for r in caps} == exp_imgs
