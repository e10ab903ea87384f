"""The north-rule shipping mode, exercised literally: package the engine as
a zip, `spark-submit --py-files kg_spark.zip jobs/run_pipeline.py`, and
assert the KG pipeline runs end-to-end with the package resolved ONLY from
the shipped archive (cwd is a scratch dir and PYTHONPATH is stripped, so a
driver- or executor-side import that bypasses --py-files fails loudly)."""

import json
import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

SUBMIT = os.environ.get("SPARK_HOME", "/opt/spark") + "/bin/spark-submit"
ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(not os.path.exists(SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    zip_path = tmp_path / "kg_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted((ROOT / "knowledge_extraction_pipeline_spark")
                        .rglob("*.py")):
            zf.write(p, p.relative_to(ROOT))
    run_dir = tmp_path / "run"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4",
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [SUBMIT, "--master", "local[4]", "--py-files", str(zip_path),
         str(ROOT / "jobs" / "run_pipeline.py"),
         "--generate-convs", "30", "--run-dir", str(run_dir), "--no-fuzzy"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1])
    assert summary["nodes"] > 0 and summary["edges"] > 0
    # the run checkpointed its stages under --run-dir (resumability evidence)
    assert any(run_dir.iterdir())
