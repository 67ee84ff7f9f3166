"""Regression: queries whose functions cross the Python-worker boundary
must run even when the DRIVER's cwd is not the repo (the harness injects
sys.path at runtime, which workers don't inherit — the package zip is
shipped via addPyFile instead)."""

from __future__ import annotations

import subprocess
import sys

PROBE = """
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("FATAL")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
qs = m.queries()
for name in ("stream_stateful_running", "multimodal_features"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
print("WORKER_IMPORT_OK")
"""


def test_python_worker_queries_run_from_foreign_cwd():
    r = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        cwd="/tmp",
        timeout=420,
    )
    assert "WORKER_IMPORT_OK" in r.stdout, r.stderr[-2000:]
