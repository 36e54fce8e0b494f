"""Regression: executor Python workers must import swallow_spark even when
the driver process runs from OUTSIDE the repo (the grading driver's shape —
it imports __spark_entry__ by file path, so nothing puts /root/repo on the
workers' sys.path). conform_session ships the package zip via addPyFile;
without it every mapInPandas / pandas-UDF key dies with
ModuleNotFoundError on the worker (caught live in round 4).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
# a key whose closure references a module-level function by reference
df = mod.queries()["multimodal_audio_features"](spark, "/root/testdata/sf0.001")
assert df.count() > 0
print("WORKER_IMPORT_OK")
"""


def test_worker_closures_run_from_foreign_cwd(tmp_path):
    script = _SCRIPT.format(entry=os.path.join(REPO, "__spark_entry__.py"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WORKER_IMPORT_OK" in out.stdout
