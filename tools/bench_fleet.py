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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    passes = []
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py")],
            capture_output=True,
            text=True,
            cwd=root,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(f"pass {i}: bench.py FAILED rc={proc.returncode}\n{proc.stderr[-2000:]}")
            raise SystemExit(1)
        d = json.loads(line)
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
    line = json.dumps(summary)
    print(line)
    if out_json:
        with open(out_json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
