"""SparkSession factory — local/cluster transparency.

The reference's core contract is that the same user script runs unmodified
on local threads or on a cluster, with all cluster detail living outside
user code (``/root/reference/example/test.py:5-13``,
``/root/reference/README.md:25-29``).  Here that contract is: user code
receives a :class:`~pyspark.sql.SparkSession`; this factory decides master
and configuration.  ``master`` resolution order: explicit argument →
``SPARK_GRAFT_MASTER`` env var → ``local[N]`` with N from
``SPARK_GRAFT_CPUS`` (default ``local[*]``).

Defaults are tuned for analytics at scale:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast) — the Spark analog of Dask's dynamic work stealing
  (SURVEY.md §4.2).
- Arrow on for pandas interchange / Pandas UDFs.
- UTC session timezone so timestamp semantics match the parquet sources
  and the DuckDB oracle.
- ``spark.sql.shuffle.partitions`` sized to core count locally; on a real
  cluster AQE coalescing makes an over-provisioned value cheap, so we set
  a large initial partition number and let AQE shrink it.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def default_conf(parallelism: int | None = None, master: str | None = None) -> dict[str, str]:
    """Engine default Spark conf (documented in BASELINE.md bench config).

    Shuffle sizing: near core count for local masters; for a remote
    cluster a high initial value (AQE *coalesces* but never splits a
    non-skew shuffle, so undersizing from the driver's CPU count would
    cap cluster parallelism — the driver machine knows nothing about
    executor count)."""
    local = master is None or master.startswith("local")
    p = parallelism
    if p is None and master:
        m = re.match(r"local\[(\d+)\]", master)
        if m:  # explicit local[N] wins over host CPU count
            p = int(m.group(1))
    if p is None:
        p = _default_parallelism()
    shuffle_parts = max(p, 8) if local else max(p, 400)
    out = {}
    if local:
        # In local mode the ONE JVM is driver + all executors; Spark's 1g
        # default heap starves a local[32] run (measured: a 110M-row hash
        # aggregation at sf1 OOMs).  Size it for the machine, overridable
        # via SPARK_GRAFT_DRIVER_MEM.  Cluster masters leave this to the
        # deployment (spark-submit / cluster manager owns JVM sizing).
        out["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    out.update({
        # --- optimizer / runtime re-planning ---
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Coalescing posture is SCOPED by master (VERDICT r7 item 1 —
        # the r8 two-pass A/B, AB_CONF_r08*.json, isolated the r7
        # core-suite regression to parallelismFirst=false on local):
        #
        # - LOCAL: Spark's default parallelismFirst=true.  Shuffle bytes
        #   are a bad proxy for compute density at bench scale — a 10 MB
        #   compute-dense stage (windows, candidate verification) that
        #   size-targeted coalescing folds onto 1-2 of 32 cores costs
        #   2x (interpolate_time_linear measured 0.6-0.9 s under true vs
        #   1.3-1.6 s under false in BOTH A/B passes).  KB-sized
        #   iteration frames still collapse: everything under
        #   minPartitionSize merges regardless of this flag, and cached
        #   plans re-coalesce via canChangeCachedPlanOutputPartitioning.
        # - CLUSTER: parallelismFirst=false with the 64m advisory — the
        #   Spark tuning-guide posture; at TB shuffle volumes per-stage
        #   byte size IS the right coalescing target, and max-parallelism
        #   coalescing would pin thousands of near-empty reducers.
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": (
            "true" if local else "false"
        ),
        # Let AQE re-coalesce CACHED plans too: a persisted 256-row
        # frame otherwise pins the full shuffle-partition fan-out for
        # every downstream stage.  Tradeoff (possible extra exchange
        # when a cache's coalesced partitioning no longer matches a
        # downstream join) is the documented one and is test-covered.
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        # --- shuffle sizing (see docstring) ---
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.default.parallelism": str(shuffle_parts),
        # --- python interchange ---
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # --- deterministic timestamp semantics (matches DuckDB oracle) ---
        "spark.sql.session.timeZone": "UTC",
        # --- scan sizing for 100TB-parquet workloads ---
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.sql.parquet.filterPushdown": "true",
        # quieter local runs
        "spark.ui.enabled": "false",
    })
    return out


def parse_hosts(spec: str) -> list[str]:
    """Resolve a ``--hosts`` value into a host list, mirroring the
    reference CLI (``/root/reference/bin/dask-ssh-docker:50-59``): a
    value naming an existing file is read as a hostfile (one host per
    line, blank lines dropped); otherwise it's a comma-separated list.
    """
    if os.path.exists(spec):
        with open(spec) as fh:
            lines = re.split(r"\r?\n", fh.read())
        return [h.strip() for h in lines if h.strip()]
    return [h.strip() for h in spec.split(",") if h.strip()]


def master_from_hosts(hosts: list[str], port: int = 7077) -> str:
    """First host becomes the master URL (`spark://host:port`) —
    the reference's "first host runs the scheduler, the rest are
    workers" contract (``bin/dask-ssh-docker`` help text + the ≥2-host
    guard at ``:61-63``).  Spark's cluster manager owns worker daemon
    lifecycle (SURVEY §7 "what NOT to build" — no SSH/Docker
    transport), so the remaining hosts are where ``start-worker.sh
    spark://host:port`` runs; this helper only completes the CLI
    parity: hostfile in, master URL out, same failure mode on a
    single-host list."""
    hosts = [h.strip() for h in hosts if h.strip()]
    if len(hosts) <= 1:
        raise ValueError(
            "at least two hosts are required: a master and one or more "
            "workers (reference contract, bin/dask-ssh-docker:61-63)"
        )
    return f"spark://{hosts[0]}:{port}"


def get_session(
    app_name: str = "spark-graft",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Mirrors ``SSHDockerCluster`` + default-``Client`` registration
    (``/root/reference/dask_ssh_docker/__init__.py:305-420``,
    ``bin/dask-ssh-docker:77-78``): after this call, user code just uses
    the session — it never constructs cluster details itself.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
        if os.environ.get("SPARK_GRAFT_CPUS")
        else "local[*]"
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = default_conf(master=master)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
