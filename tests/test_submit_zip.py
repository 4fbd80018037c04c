"""spark-submit --py-files deployment smoke test.

The north rule ships the engine to a multi-executor cluster as
`spark-submit --py-files refine_spark.zip scripts/submit_job.py`; this
test proves that contract end-to-end in local mode: the zip built by
scripts/make_submit_zip.py is the ONLY source of the refine_spark
package visible to the submitted job (cwd is a scratch dir, PYTHONPATH
is scrubbed), and the job runs the full dedup pipeline on a synthetic
corpus and emits its JSON receipt.

Runs a fresh JVM (~1 min); kept to one case on a tiny corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_deterministic_and_library_only(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_submit_zip import build
    finally:
        sys.path.pop(0)

    z1, z2 = tmp_path / "a.zip", tmp_path / "b.zip"
    names = build(str(z1))
    build(str(z2))
    assert z1.read_bytes() == z2.read_bytes(), "zip must be reproducible"
    with zipfile.ZipFile(z1) as zf:
        members = zf.namelist()
    assert all(m.startswith("refine_spark/") and m.endswith(".py") for m in members)
    assert "refine_spark/pipeline.py" in members
    assert "refine_spark/__init__.py" in members
    assert len(members) == len(names)


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pyspark_home = os.path.join(os.path.dirname(os.__file__),
                                    "site-packages", "pyspark")
        cand = os.path.join(pyspark_home, "bin", "spark-submit")
        spark_submit = cand if os.path.exists(cand) else None
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_submit_zip import build
    finally:
        sys.path.pop(0)

    zip_path = tmp_path / "refine_spark.zip"
    build(str(zip_path))
    job = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)

    # scratch cwd + scrubbed PYTHONPATH: the zip is the only way the
    # executors (and driver) can import refine_spark
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_LOCAL_DIRS"] = str(tmp_path / "spark-local")
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(job), "--synth", "800",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON receipt in stdout:\n{out.stdout[-2000:]}"
    receipt = json.loads(lines[-1])
    # gen_documents(n) overshoots n by up to one family (its while-loop
    # stops at the first total >= n), so derive the expected count from
    # the generator instead of assuming it lands exactly on n
    from refine_spark import synth

    expected_docs = len(synth.gen_documents(800)[0])
    assert receipt["docs"] == expected_docs
    # the synthetic corpus plants duplicate clusters at every size
    assert receipt["clusters"] > 0
    assert receipt["dup_docs"] >= 2 * receipt["clusters"]
