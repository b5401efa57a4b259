"""Executor code-shipping pin (functions/shipping.py).

PySpark pickles module functions by reference, so a worker-side closure
capturing one (e.g. ``ivf._assign`` → ``pq._nearest_rows``) used to need
``dask_ssh_docker_spark`` importable inside every Python worker — true
when the driver runs from the repo root (workers inherit cwd), silently
broken for a consumer who only ``sys.path``-inserts the repo on the
driver (and, on a real cluster, for executors without the package
installed).  The by-value registration makes shipped closures
self-contained; this test runs the previously-breaking queries from a
NON-repo cwd in a fresh subprocess with the package importable on the
driver only."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
for name in ("sim_topk_ivf", "dedup_semantic_semdedup"):
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
    print("SHIPOK", name, n)
"""


def test_worker_closures_run_without_package_on_worker_path():
    repo = "/root/repo"
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=600,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"  # the repo must NOT leak to workers via env
        },
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert proc.stdout.count("SHIPOK") == 2, proc.stdout
