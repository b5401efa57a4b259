#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1): for each
headline query report wall seconds (best of N after warm-up), the number
of Spark jobs / stages / tasks the query submits (driver round-trips are
fixed cost that multiplies at 100 TB when they hide corpus passes), and
optionally dump the formatted plan.

Usage:
    python tools/profile_queries.py [query ...]        # default: bench HEADLINE
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_queries.py

Output: one JSON line per query:
    {"name": ..., "wall_best": s, "walls": [...], "n_jobs": J,
     "n_stages": S, "n_tasks": T,
     "floor_probe": s, "wall_norm": s}

Jobs are counted with a per-run job group (statusTracker.getJobIdsForGroup)
— the count includes every eager action the query function performs while
*building* the frame (collects, eager checkpoints, broadcast builds) plus
the final noop write.

Floor normalization (r14, VERDICT r13 item 8): this sandbox throttles
under sustained load — r13's driver window ran at floors 1.5-1.6× r12's
and 24 spurious "regressions" followed.  A fixed micro-probe (codegen +
one small shuffle, the same two cost regimes bench.py's spark_floor
covers, scaled ~5× down so interleaving is affordable) now runs right
before EACH query's measurement; ``wall_norm = wall_best *
(ref_floor / floor_probe)`` re-expresses the wall at the reference
machine speed (``ref_floor`` = the minimum probe seen in the run — the
window's best state).  When floors diverge between two profile runs,
compare wall_norm; when they agree, wall_best is the honest number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def floor_probe(spark) -> float:
    """One fixed micro-probe (~0.15 s on an idle box): codegen arithmetic
    + a 1000-group shuffle — best of 2 so one GC blip doesn't misread the
    window.  NEVER change the shapes; cross-run comparability is the
    point (same contract as bench.spark_floor)."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(10_000_000).selectExpr("sum(id * 3 + (id & 7))").collect()
        (
            spark.range(800_000)
            .groupBy((F.col("id") % 1000).alias("k"))
            .agg(F.sum("id").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def profile(spark, name: str, fn, sf_dir: str, runs: int = 3) -> dict:
    sc = spark.sparkContext
    walls: list[float] = []
    n_jobs = n_stages = n_tasks = 0
    for i in range(runs):
        group = f"profile:{name}:{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        sc.setJobGroup(None, None)
        if i == runs - 1:  # count jobs on the last (warmest) run
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            n_jobs = len(job_ids)
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is None:
                    continue
                n_stages += len(info.stageIds)
                for sid in info.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None:
                        n_tasks += sinfo.numTasks
    return {
        "name": name,
        "wall_best": min(walls),
        "walls": walls,
        "n_jobs": n_jobs,
        "n_stages": n_stages,
        "n_tasks": n_tasks,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    names = sys.argv[1:] or HEADLINE
    unknown = [q for q in names if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    spark = get_session("spark-graft-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    floor_probe(spark)  # probe warm-up (codegen compile)

    results = []
    for name in names:
        fp = floor_probe(spark)  # window state RIGHT BEFORE this query
        r = profile(spark, name, REGISTRY[name].fn, sf_dir)
        r["floor_probe"] = fp
        results.append(r)
        print(json.dumps(r), flush=True)
    ref = min(r["floor_probe"] for r in results)
    for r in results:
        r["wall_norm"] = round(r["wall_best"] * ref / r["floor_probe"], 3)
    total = round(sum(r["wall_best"] for r in results), 3)
    total_norm = round(sum(r["wall_norm"] for r in results), 3)
    print(json.dumps({
        "total_wall_best": total,
        "total_wall_norm": total_norm,
        "ref_floor": ref,
        "n": len(results),
        "wall_norm": {r["name"]: r["wall_norm"] for r in results},
    }))


if __name__ == "__main__":
    main()
