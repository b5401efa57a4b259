"""Audit: which registry queries physically scan the same parquet file
more than once in their EXECUTED plan, and does exchange/stage reuse
cover any of it?

Motivation (r10, BENCH_NOTES §5b): a frame feeding two consumers can
silently re-run its whole scan→transform pipeline per consumer when the
branch subtrees don't canonicalize equal (column pruning, semi-join
pushdown, countDistinct's Expand all diverge them).  Three queries were
found that way by hand (inverted_index_postings, text_tfidf_top_terms,
corpus_overlap_sources — each fixed or consciously kept); this tool
makes the sweep exhaustive and repeatable so the class can't silently
regrow.

For every registry query at sf0.001 (smallest data — we read plan
shape, not timing): execute, then count per-parquet-path FileScan
occurrences and ReusedExchange nodes in the final adaptive plan.
Queries where some path appears ≥ 2 times are printed with their reuse
count for manual classification — a self-join or a different-
filter/different-column double read is legitimate; an identical
pipeline executed twice is the anti-pattern.

Usage: python tools/audit_double_scan.py [sf_dir]
"""

import re
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    spark = get_session("audit-double-scan")
    multi = 0
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            df.collect()
        except Exception as exc:  # keep sweeping; report at the end
            print(f"ERR   {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE appends a pre-adaptive "Initial Plan" section after every
        # final plan (including one per adaptive subquery), duplicating
        # each node — keep only the executed sections
        kept, skipping = [], False
        for line in plan.splitlines():
            if "== Initial Plan ==" in line:
                skipping = True
            elif "== Final Plan ==" in line or line.startswith("Subquery"):
                skipping = False
            if not skipping:
                kept.append(line)
        plan = "\n".join(kept)
        paths = re.findall(r"InMemoryFileIndex\(\d+ paths\)\[[^\]]*?([^/\]]+\.parquet)", plan)
        counts: dict[str, int] = {}
        for p in paths:
            counts[p] = counts.get(p, 0) + 1
        dup = {p: c for p, c in counts.items() if c >= 2}
        reused = plan.count("ReusedExchange")
        if dup:
            multi += 1
            print(
                f"MULTI {name}: {dup} reused_exchanges={reused}"
                f"  [{time.time() - t0:.1f}s]",
                flush=True,
            )
    print(f"\n{multi} queries with a multi-scanned path (see classification "
          f"in BENCH_NOTES r10 §5c)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
