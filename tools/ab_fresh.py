#!/usr/bin/env python
"""Fresh-process A/B: run a query subset under one conf delta per
invocation, printing one JSON line.  The caller alternates variants
across fresh processes in one window (the driver-bench condition —
each round's bench is a cold JVM, so within-process positional A/Bs
must be confirmed cold).

Usage: python tools/ab_fresh.py <variant> [sf_dir]
  variant: newconf (current default_conf) | r7conf (re-apply the r7 flags)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "window_cumsum",
    "resample_hourly",
    "interpolate_time_linear",
    "sessionize_10m",
    "setsim_prefix_pairs",
    "sim_topk_lsh",
    "dedup_minhash_clusters",
]

DELTAS = {
    "newconf": {},
    "r7conf": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
}


def main() -> None:
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    spark = get_session(f"abf-{variant}", conf=DELTAS[variant])
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {"variant": variant, "total": round(sum(timings.values()), 3),
             "queries": timings}
        )
    )


if __name__ == "__main__":
    main()
