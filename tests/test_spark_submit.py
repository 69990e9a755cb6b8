"""North-rule invocation mode: the engine runs via spark-submit
--py-files on a packaged zip (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster"). The sandbox has
no cluster manager, so local[4] stands in for the master URL — the
packaging, py-files shipping, and CLI surface are exactly what a
cluster run uses."""

import json
import os
import shutil
import subprocess

import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def test_spark_submit_py_files_replay():
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH or in the pyspark install")
    work = tempfile.mkdtemp(prefix="submit_")
    zip_path = os.path.join(work, "engine.zip")
    # run a COPY of the job script from the work dir so its repo-root
    # sys.path fallback points nowhere and the package must resolve
    # from the shipped zip, as on a real cluster
    job = os.path.join(work, "cdc_replay_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "cdc_replay_job.py"), job)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "dbt_customer360_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py") or f.endswith(".csv"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    out = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            job,
            "--generate",
            "20000",
            "--table",
            os.path.join(work, "lake", "repos"),
            "--lineage",
            os.path.join(work, "lake", "lineage"),
            "--batches",
            "3",
            "--buckets",
            "8",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=work,  # NOT the repo root: the package must come from the zip
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    res = json.loads(lines[-1])
    assert res["rows_applied"] == 20000
    assert res["final_rows"] > 0 and res["snapshot_id"] >= 3
    shutil.rmtree(work, ignore_errors=True)
