#!/usr/bin/env python
"""Closing bench mode (VERDICT r8 item 7): N fresh-JVM bench passes,
each self-controlled by the stabilized spark_floor inside bench.py, with
a cross-pass summary.  One throttled window can no longer masquerade as
a code regression (or a win): every pass carries both floors, and the
summary reports per-query minima across passes next to per-pass floors.

Usage: python tools/bench_fleet.py [n_passes] [out_json]
Prints each pass's JSON line as it lands, then ONE summary JSON line
(same schema as bench.py plus "passes"/"pass_floors"), optionally
written to out_json.

GATE-INTERPRETATION RULE (VERDICT r9 item 7 — the contract the floors
enable, so rounds stop re-litigating window-vs-code): a per-query gate
(e.g. "sim_topk_lsh ≤ 1.2 s") is judged at the FLEET-MIN across passes,
and only in a window whose best pass spark_floor.total is within 15% of
the historical best floor recorded in BENCH_NOTES (currently 0.87-0.92
on this machine).  If no pass reaches that floor band, the gate is
DEFERRED — the number is recorded with its floor, but neither a miss
nor a pass is claimed, because a throttled JVM shifts per-query walls
2-4× in ways the DuckDB floor cannot see.  Medians are reported for
spread visibility, never gated on (they mix throttled passes back in).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

# --- zipf lane (VERDICT r10 item 3) -----------------------------------
# r10 proved the legacy corpus's 30-word vocabulary makes the dedup/text
# family's numbers collision artifacts (95x shingle collision density;
# BENCH_NOTES r10 §1): setsim looked pathological, minhash/simhash looked
# artificially cheap.  The closing battery therefore runs these six on
# the realistic 50k-term zipfian corpus at sf1, with per-query gates set
# from the r10 zipf measurements (+ the r11 tfidf/bm25 baselines), judged
# at fleet-min and only when the best lane pass's spark_floor is within
# the healthy band (<= ZIPF_FLOOR_MAX) — same floor discipline as the
# legacy gates.
ZIPF_SF_DIR = "testdata_sf1_zipf/sf1"
ZIPF_FLOOR_MAX = 1.05
# Gates are for THIS measurement mode — bench.py steady-state best-of-3
# in a warmed JVM (r11 baselines @ floor 0.76-0.93) — NOT the r10 cold
# single-run sweep numbers (those were 2-7x higher: setsim 10.5-12.8,
# minhash 11-14; BENCH_NOTES r10 §1).  ~50% headroom over baseline.
ZIPF_GATES = {
    "setsim_prefix_pairs": 2.5,  # r11 baseline 1.66
    "dedup_minhash_clusters": 7.0,  # 4.67
    # r13: the registry query switched to the md5_64 cross-engine hash
    # family for its oracle promotion (BENCH_NOTES r13) — md5 per token
    # costs ~2x xxhash64 at zipf-sf1 (A/B steady-state 9.5 vs 5.6 s; the
    # xxhash64 production DEFAULT is unchanged and pytest-pinned).  Gate
    # re-based on the md5_64 measurement with the same ~40-50% headroom.
    "dedup_simhash_pairs": 13.0,  # 9.2-9.5 (md5_64); xxhash64 path 5.6
    "dedup_winnow_spans": 5.0,  # 3.31
    "text_tfidf_top_terms": 7.0,  # 4.77-5.08
    "text_bm25_rank": 3.2,  # 2.13-2.19
}

# --- legacy-lane enforced gates (r12, VERDICT r11 item 5) -------------
# Previously the minhash/lsh gates were judged by READING the summary
# JSON; these are now machine-enforced at fleet-min under the same floor
# rule as the zipf lane.  stream_mv_user_totals gets a documented-floor
# gate: its cost decomposes as ~0.33 s fixed per-query trigger overhead
# (3 × offset-WAL+commit ≈ 110 ms — exactly-once bookkeeping, no state
# store involved) + ~1.1-1.3 s of AQE-less foreachBatch merge jobs
# (BENCH_NOTES r12 §2); fleet-min r11 was 1.887, gate at +20%.
LEGACY_FLOOR_MAX = 1.05
LEGACY_GATES = {
    "dedup_minhash_clusters": 2.0,
    "sim_topk_lsh": 1.2,
    "stream_mv_user_totals": 2.3,
}

CORE15 = [
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


def _run_bench(root: str, i: int, env: dict | None = None, tag: str = "") -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True,
        text=True,
        cwd=root,
        env={**os.environ, **(env or {})},
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0 or not line.startswith("{"):
        print(f"{tag}pass {i}: bench.py FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
        raise SystemExit(1)
    return json.loads(line)


def zipf_lane(root: str, n_passes: int = 2) -> dict:
    """Run the dedup/text-family lane on the zipfian-sf1 corpus and judge
    ZIPF_GATES at fleet-min under the floor rule.  Returns the lane block
    for the summary JSON."""
    env = {
        "SPARK_GRAFT_SF_DIR": os.path.join(root, ZIPF_SF_DIR),
        "SPARK_GRAFT_BENCH_QUERIES": ",".join(ZIPF_GATES),
    }
    passes = []
    for i in range(n_passes):
        d = _run_bench(root, i, env, tag="zipf ")
        passes.append(d)
        print(
            f"zipf pass {i}: total={d['value']} "
            f"spark_floor={d['spark_floor']['total']}",
            flush=True,
        )
    best_floor = min(p["spark_floor"]["total"] for p in passes)
    floor_ok = best_floor <= ZIPF_FLOOR_MAX
    gates = {}
    for q, gate in ZIPF_GATES.items():
        v = round(min(p["queries"][q] for p in passes), 3)
        status = "deferred" if not floor_ok else ("pass" if v <= gate else "MISS")
        gates[q] = {"gate": gate, "fleet_min": v, "status": status}
    return {
        "sf_dir": ZIPF_SF_DIR,
        "passes": n_passes,
        "pass_totals": [p["value"] for p in passes],
        "pass_spark_floors": [p["spark_floor"]["total"] for p in passes],
        "best_floor": best_floor,
        "floor_band_ok": floor_ok,
        "gates": gates,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 3
    out_json = args[1] if len(args) > 1 else None
    with_zipf = "--no-zipf" not in sys.argv[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    passes = []
    for i in range(n):
        d = _run_bench(root, i)
        passes.append(d)
        core = round(sum(d["queries"][q] for q in CORE15), 3)
        print(
            f"pass {i}: total={d['value']} core15={core} "
            f"spark_floor={d['spark_floor']['total']} "
            f"(hist {d['spark_floor']['stabilize_history']}) "
            f"duckdb_floor={d['duckdb_floor']['total']}",
            flush=True,
        )

    names = list(passes[0]["queries"])
    best = {q: round(min(p["queries"][q] for p in passes), 3) for q in names}
    med = {
        q: round(statistics.median(p["queries"][q] for p in passes), 3)
        for q in names
    }
    summary = {
        "metric": "headline_suite_total",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "sf": passes[0]["sf"],
        "mode": f"fleet_min_of_{n}_fresh_jvms",
        "core15": round(sum(best[q] for q in CORE15), 3),
        "queries_median": med,
        "core15_median": round(sum(med[q] for q in CORE15), 3),
        "duckdb_floor": min(
            (p["duckdb_floor"] for p in passes), key=lambda f: f["total"]
        ),
        "spark_floor": min(
            (p["spark_floor"] for p in passes), key=lambda f: f["total"]
        ),
        "pass_totals": [p["value"] for p in passes],
        "pass_core15": [
            round(sum(p["queries"][q] for q in CORE15), 3) for p in passes
        ],
        "pass_spark_floors": [p["spark_floor"]["total"] for p in passes],
        "pass_duckdb_floors": [p["duckdb_floor"]["total"] for p in passes],
    }
    # legacy-lane gates: fleet-min over the main passes, floor-banded
    legacy_floor_ok = min(summary["pass_spark_floors"]) <= LEGACY_FLOOR_MAX
    summary["legacy_gates"] = {
        q: {
            "gate": gate,
            "fleet_min": best[q],
            "status": "deferred"
            if not legacy_floor_ok
            else ("pass" if best[q] <= gate else "MISS"),
        }
        for q, gate in LEGACY_GATES.items()
    }
    misses = [
        q for q, g in summary["legacy_gates"].items() if g["status"] == "MISS"
    ]
    if misses:
        print(f"LEGACY LANE GATE MISS: {misses}", flush=True)
    if with_zipf:
        summary["zipf_lane"] = zipf_lane(root)
        zmisses = [
            q
            for q, g in summary["zipf_lane"]["gates"].items()
            if g["status"] == "MISS"
        ]
        if zmisses:
            print(f"ZIPF LANE GATE MISS: {zmisses}", flush=True)
        misses += zmisses
    line = json.dumps(summary)
    print(line)
    if out_json:
        with open(out_json, "w") as fh:
            fh.write(line + "\n")
    # ADVICE r11: gates are ENFORCED, not advisory — exit nonzero on any
    # MISS (legacy or zipf lane) so check_all.sh's `set -e` actually
    # fails the run.  The JSON is written first so the miss is recorded.
    if misses:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
