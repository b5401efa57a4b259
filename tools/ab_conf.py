#!/usr/bin/env python
"""One-window A/B of session-conf variants over the regressed bench set.

VERDICT r7 item 1: ten untouched queries regressed 15-119% r6->r7 at
equal DuckDB-floor speed; suspects are the three session-wide conf
changes that landed in r7.  This harness measures every variant in the
SAME process window (sandbox speed swings 1.2-1.5x between windows —
memory/BENCH_NOTES), stopping and rebuilding the SparkSession per
variant inside one JVM, with the DuckDB floor re-timed per variant as
the drift control.

Usage: python tools/ab_conf.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # original 15-query core (cross-round anchor)
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_region_revenue",
    "window_cumsum",
    "resample_hourly",
    "sessionize_10m",
    "asof_backward",
    "dedup_exact_groups",
    "dedup_minhash_clusters",
    "text_quality",
    "sim_topk_bruteforce",
    "rollup_cascade_daily",
    "interpolate_time_linear",
    "text_chunk_windows",
    "text_tfidf_top_terms",
    # worst r6->r7 regressors outside the core
    "setsim_prefix_pairs",
    "sim_topk_lsh",
    "scd2_priority_history",
    "cdc_merge_upsert",
]

CORE15 = QUERIES[:15]

# conf deltas relative to the CURRENT default_conf (r7 state).
#
# Round 2 ordering: REVERSED vs round 1 (r7_asis last) so the
# first-variant JVM-JIT warmup penalty lands on the opposite end — a
# variant that wins in BOTH orders wins for real.  comboA tests the two
# flag reverts together while keeping the 8m advisory.
VARIANTS: dict[str, dict[str, str]] = {
    "comboA": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false",
    },
    "r6_conf": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false",
    },
    "noCachedReplan": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false"
    },
    "parallelismFirst": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true"
    },
    "advisory64m": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"},
    "r7_asis": {},
}


def duck_floor(sf_dir: str) -> float:
    import duckdb

    from dask_ssh_docker_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tot = 0.0
    for name in ("q1_pricing_summary", "q5_region_revenue", "text_quality"):
        sql = REGISTRY[name].oracle
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        tot += best
    con.close()
    return round(tot, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    from pyspark.sql import SparkSession

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import default_conf

    master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    results: dict[str, dict] = {}
    for vname, delta in VARIANTS.items():
        if only and vname not in only:
            continue
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        conf = default_conf(master=master)
        conf.update(delta)
        # unset-style override: empty string means remove the key
        builder = SparkSession.builder.appName(f"ab-{vname}").master(master)
        for k, v in conf.items():
            builder = builder.config(k, v)
        spark = builder.getOrCreate()
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

        timings: dict[str, float] = {}
        for name in QUERIES:
            fn = REGISTRY[name].fn
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        floor = duck_floor(sf_dir)
        core = round(sum(timings[q] for q in CORE15), 3)
        results[vname] = {
            "core15": core,
            "total": round(sum(timings.values()), 3),
            "floor": floor,
            "queries": timings,
        }
        print(
            json.dumps({"variant": vname, "core15": core, "floor": floor,
                        "queries": timings}),
            flush=True,
        )

    with open("AB_CONF_r08.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
