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
     "n_stages": S, "n_tasks": T}

Jobs are counted with a per-run job group (statusTracker.getJobIdsForGroup)
— the count includes every eager action the query function performs while
*building* the frame (collects, eager checkpoints, broadcast builds) plus
the final noop write.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    results = []
    for name in names:
        r = profile(spark, name, REGISTRY[name].fn, sf_dir)
        results.append(r)
        print(json.dumps(r), flush=True)
    total = round(sum(r["wall_best"] for r in results), 3)
    print(json.dumps({"total_wall_best": total, "n": len(results)}))


if __name__ == "__main__":
    main()
