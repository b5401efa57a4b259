#!/usr/bin/env python
"""Spark-only per-query wall-time sweep over the full registry.

Produces the ``SWEEP_SF1_SPARK.log``-style evidence file: one line per
registry query, cold (single run), with class annotations so outlier
passes don't re-litigate known shapes (VERDICT r7 item 7):

- ``[wall-bound]``    — streaming fixtures that execute real micro-batch
  epochs (availableNow) with per-epoch checkpoint/state-store I/O; their
  wall time is trigger/epoch overhead, not operator compute.
- ``[validation-cap]`` — O(n²) exact baselines whose input is capped at
  validation scale above 6000 rows (queries print the skip themselves).

Usage: python tools/sweep_spark.py <sf_dir> [out_log] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries that run real micro-batch epochs — wall time is epoch/trigger
#: overhead (state store commits, checkpoint fsyncs), not compute
WALL_BOUND_PREFIX = "stream_"

#: O(n²) validation baselines with the _util.validation_cap input bound —
#: DERIVED from the registry flag at runtime (single source of truth,
#: ADVICE r8); this literal only documents the expected members and is
#: cross-checked against the registry in main().
VALIDATION_CAPPED = {
    "dedup_jaccard_pairs",
    "dedup_clusters_transitive",
    "sim_neardup_pairs",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    only = set(sys.argv[3:]) or None

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.queries.registry import validation_capped_names
    from dask_ssh_docker_spark.session import get_session

    capped = validation_capped_names()
    if capped != VALIDATION_CAPPED:  # literal above is documentation only
        print(f"# NOTE: registry validation_capped set is {sorted(capped)} "
              f"(module literal is stale)", flush=True)

    spark = get_session("spark-graft-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    # Stabilize + stamp the Spark-side floor (VERDICT r8 items 1/5): a
    # fresh JVM reads 2-4× slow for minutes (tiered JIT), so un-floored
    # cold sweeps are not comparable across windows.  Same loop as
    # bench.py; the stamp goes in the log header.
    from bench import spark_floor  # repo root is on sys.path

    fl = spark_floor(spark)
    hist = [fl["total"]]
    while len(hist) < 8:
        nxt = spark_floor(spark)
        prev = hist[-1]
        fl = nxt
        hist.append(nxt["total"])
        if abs(nxt["total"] - prev) <= 0.12 * prev:
            break
    floor_line = f"# spark_floor: {fl} stabilize_history={hist}"
    print(floor_line, flush=True)

    lines = [
        f"# Spark-only per-query wall times at {sf_dir} (cold, single run, "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])",
        "# Annotations: [wall-bound] = real micro-batch epochs, wall time is",
        "#   trigger/state-store overhead, not compute;",
        "# [validation-cap] = O(n^2) exact baseline, input capped at",
        "#   validation scale (the query logs what it skipped).",
        floor_line,
    ]
    # Mid-sweep floor re-probes (r9): the header floor alone proved
    # insufficient — throttle arrived MID-sweep in the r9 run (floors
    # 0.9→1.6+ within one sweep), so a single-probe checkpoint every
    # REPROBE_EVERY queries is interleaved into the log.  One pass (not
    # the full stabilization loop — the JVM is already warm here) costs
    # ~1-3 s; readers discount the surrounding lines by the nearest stamp.
    REPROBE_EVERY = 25
    i = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        tags = []
        if name.startswith(WALL_BOUND_PREFIX):
            tags.append("[wall-bound]")
        if name in capped:
            tags.append("[validation-cap]")
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            line = f"{name} {dt}" + ("" if not tags else " " + " ".join(tags))
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            line = f"{name} ERROR {type(exc).__name__}: {str(exc)[:120]}"
        print(line, flush=True)
        lines.append(line)
        i += 1
        if i % REPROBE_EVERY == 0:
            probe = spark_floor(spark)["total"]
            pline = f"# spark_floor re-probe after {i} queries: {probe}"
            print(pline, flush=True)
            lines.append(pline)

    if out_path:
        with open(out_path, "w") as fh:
            fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
