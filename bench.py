#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver).  Headline set = one query per operator family
(scan/agg, fact join, star join, window scan, event-time session, as-of
join, exact dedup, minhash near-dup, text quality, vector top-k).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
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
    # r6 breadth (VERDICT r5 item 4): regression visibility for the
    # graph / CDC / ANN / set-sim / streaming / ranking / feature
    # families that previously had none.  Names are append-only; the
    # original 15 keep their cross-round comparability.
    "pagerank_nation_trade",
    "cdc_merge_upsert",
    "scd2_priority_history",
    "sim_topk_lsh",
    "sim_topk_pq",
    "setsim_prefix_pairs",
    "stream_mv_user_totals",
    "text_bm25_rank",
    "rfm_customer_segments",
    "target_encode_loo",
    # r7 additions: substring-dedup family + composed IVF-PQ
    "dedup_substring_spans",
    "dedup_winnow_spans",
    "sim_topk_ivfpq",
    # r7 additions: semantic dedup, incremental bloom dedup, corpus overlap
    "dedup_semantic_semdedup",
    "dedup_incremental_bloom",
    "corpus_overlap_sources",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Lane override (tools/bench_fleet.py zipf lane, VERDICT r10 item 3):
    # a comma-separated subset replaces HEADLINE so a lane can measure
    # the dedup/text family on the realistic-vocabulary corpus without
    # paying the full 31-query suite per pass.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    queries = [q for q in subset.split(",") if q] or HEADLINE
    m = re.search(r"sf([0-9.]+)", sf_dir)
    digits = m.group(1).strip(".") if m else ""
    sf = float(digits) if digits else None

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    # Validate the subset BEFORE the multi-minute JVM warm-up / floor
    # stabilization (ADVICE r11): a typo'd name must fail fast with the
    # offending names, not as a KeyError after minutes of warm-up.
    unknown = [q for q in queries if q not in REGISTRY]
    if unknown:
        raise SystemExit(
            f"bench.py: unknown query names (not in REGISTRY): {unknown}"
        )

    spark = get_session("spark-graft-bench")

    # JVM/codegen warm-up on a trivial job so q1 doesn't pay startup costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Spark-side floor, STABILIZED before the headline queries: a fresh
    # JVM's tiered JIT takes minutes to reach steady state (measured r9:
    # first floor pass 3.53 s vs 0.89 s after the suite — 4×, invisible
    # to the DuckDB floor), so without this loop the first queries pay a
    # window-dependent cold tax that reads as a code regression.  Repeat
    # the probes until two consecutive passes agree within 12% (max 8
    # passes), then measure queries in steady state.  The full
    # pass history is recorded so a window that NEVER stabilizes (true
    # sandbox throttle, not JIT) is visible in the JSON.
    floor_pre = spark_floor(spark)
    floor_hist = [floor_pre["total"]]
    while len(floor_hist) < 8:
        nxt = spark_floor(spark)
        prev = floor_hist[-1]
        floor_pre = nxt
        floor_hist.append(nxt["total"])
        if abs(nxt["total"] - prev) <= 0.12 * prev:
            break  # two consecutive passes agree → steady state
    floor_pre["stabilize_history"] = floor_hist

    # One warm-up + measured runs per query (steady-state, JMH-style):
    # the first execution of each plan shape pays one-time codegen
    # compilation and file-listing costs that are not the operator's cost;
    # best-of-3 absorbs transient machine-load noise.
    timings: dict[str, float] = {}
    for name in queries:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # Re-probe the Spark floor AFTER the suite: if post diverges from pre,
    # the window throttled mid-run and the per-query walls are suspect.
    floor_pre["post_total"] = spark_floor(spark)["total"]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "mode": "steady_state_best_of_3",
                "duckdb_floor": duckdb_floor(sf_dir),
                "spark_floor": floor_pre,
            }
        )
    )


def spark_floor(spark) -> dict[str, float]:
    """Fixed Spark-side micro-suite measured in the SAME JVM window.

    Why (VERDICT r8 item 1): the DuckDB floor is C++ and cannot see
    JVM-side throttling — r8's driver vs builder windows read 16.21 vs
    11.78 s core-15 at *equal* DuckDB floors (1.085/1.089), so the C++
    control alone cannot tell a code regression from a throttled JVM.
    Three fixed probes cover the three cost regimes of the suite:

    - ``codegen``: whole-stage-codegen arithmetic over ``range`` — pure
      JVM/JIT compute, no I/O, no Python.
    - ``shuffle``: a 1000-group hash aggregate over 4M rows — one
      exchange, the suite's dominant physical op.
    - ``arrow``: a ``mapInPandas`` identity + sum over 1M rows — the
      Python-worker/Arrow serialization path the UDF-backed queries use.

    Best-of-3 after one warm-up each, mirroring the query measurement
    mode.  NEVER change the probe shapes or sizes — cross-round
    comparability is the point.  Round-over-round bench claims are
    stated normalized by BOTH floors (BENCH_NOTES).
    """
    from pyspark.sql import functions as F

    probes = {}

    def _codegen():
        spark.range(50_000_000).selectExpr(
            "sum(id * 3 + (id & 7))"
        ).collect()

    def _shuffle():
        (
            spark.range(4_000_000)
            .groupBy((F.col("id") % 1000).alias("k"))
            .agg(F.sum("id").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )

    def _arrow():
        import pandas as pd  # noqa: F401

        def _ident(it):
            for pdf in it:
                yield pdf

        (
            spark.range(1_000_000)
            .mapInPandas(_ident, "id long")
            .selectExpr("sum(id)")
            .collect()
        )

    for name, fn in (("codegen", _codegen), ("shuffle", _shuffle),
                     ("arrow", _arrow)):
        fn()  # warm-up (JIT, python worker spin-up)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        probes[name] = round(best, 3)
    probes["total"] = round(sum(probes.values()), 3)
    return probes


#: fixed control queries for the sandbox-variance floor (never change these
#: names — cross-round comparability is the point)
FLOOR = ["q1_pricing_summary", "q5_region_revenue", "text_quality"]


def duckdb_floor(sf_dir: str) -> dict[str, float]:
    """Time 3 FIXED DuckDB oracle queries in the same process window.

    Why (VERDICT r3 item 4): the driver's wall-times swing with sandbox
    load/page-cache state; the DuckDB floor measured in the SAME window is
    the control that separates environment variance from code regressions
    — if Spark times drift while the floor holds, suspect the code; if
    both drift together, it's the window.  Best-of-3 after one warm-up,
    mirroring the Spark measurement mode."""
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
    floor: dict[str, float] = {}
    for name in FLOOR:
        sql = REGISTRY[name].oracle
        con.execute(sql).fetchall()  # warm-up (page cache, plan)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        floor[name] = round(best, 3)
    floor["total"] = round(sum(floor.values()), 3)
    return floor


if __name__ == "__main__":
    main()
