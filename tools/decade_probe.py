"""Two-decade scaling probe: the round-4 decade set measured at sf1 AND
sf10 in ONE session (steady-state best-of-3, noop sink, floor-stamped),
so the sf0.1→sf1 curve (BENCH_NOTES r4) extends to sf0.1→sf1→sf10 with
the two fresh points mutually comparable — same JVM, same window, same
methodology.

Why: the 100 TB story is an extrapolation; every measured decade pins
the curve's shape.  r4 established 10× data → 3.0× wall with no
super-linear query; this probe tests whether the asymptote HOLDS for
the second decade (scan-bound queries should now sit near-linear, the
floor-bound ones should start moving with data, and nothing may bend
upward faster than linear).

Usage: python tools/decade_probe.py [SF1_DIR [SF10_DIR [out_json]]]
Defaults: /root/repo/testdata_sf1/sf1, /root/repo/testdata_sf10/sf10.
Set SPARK_GRAFT_DRIVER_MEM (default 16g; 48g recommended for sf10).
"""

import json
import sys
import time

sys.path.insert(0, ".")

# the round-4 decade set (BENCH_NOTES r4 table), unchanged so the
# decades chain: sf0.1→sf1 from r4, sf1→sf10 from here
DECADE_SET = [
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
]


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1/sf1"
    sf10_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf10/sf10"
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from bench import spark_floor
    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    spark = get_session("decade-probe")

    # stabilize the JIT before any measurement (bench.py contract)
    hist = [spark_floor(spark)["total"]]
    while len(hist) < 8:
        nxt = spark_floor(spark)["total"]
        prev = hist[-1]
        hist.append(nxt)
        if abs(nxt - prev) <= 0.12 * prev:
            break

    result = {
        "metric": "decade_probe",
        "unit": "sec",
        "mode": "steady_state_best_of_3",
        "queries": DECADE_SET,
        "floor_stabilize_history": [round(h, 3) for h in hist],
        "scales": {},
    }
    for label, sf_dir in (("sf1", sf1_dir), ("sf10", sf10_dir)):
        floor = spark_floor(spark)["total"]
        timings = {}
        for name in DECADE_SET:
            fn = REGISTRY[name].fn
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(f"{label} {name} {timings[name]}", flush=True)
        result["scales"][label] = {
            "sf_dir": sf_dir,
            "spark_floor_pre": round(floor, 3),
            "spark_floor_post": round(spark_floor(spark)["total"], 3),
            "timings": timings,
            "total": round(sum(timings.values()), 3),
        }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
