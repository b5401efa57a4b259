#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline queries
with the scale-relevant properties annotated.  Run after changing any
operator: `python tools/dump_plans.py`."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("q1_pricing_summary", "scan→filter→partial/final hash agg; pushdown + pruning"),
    ("q5_region_revenue", "star join: hints ONLY on fixed dims (region/nation); customer/supplier joins AQE-decided"),
    ("topk_orders", "top-k as TakeOrderedAndProject (no full sort)"),
    ("asof_backward", "as-of join: ONE exchange (the by-key shuffle)"),
    ("dedup_exact_groups", "dedup: only (hash,id) shuffles, bodies pruned"),
    ("sim_topk_bruteforce", "broadcast query set, map-side scoring, ranking window"),
    ("window_cumprod", "cumprod scan: one key shuffle, three window sums, no UDF"),
    ("map_overlap_centered_mean", "halo explode + one (key,chunk) shuffle into ArrowEvalPython-free applyInPandas"),
    ("text_gopher_quality", "explode → (doc,token) partial agg → doc agg; map-side combine both hops"),
    ("funnel_view_click_purchase", "event funnel: chained conditional-min windows over ONE user_id exchange (no self-joins)"),
    ("text_bigram_logprob", "bigram LM: (w1,w2) count shuffle + w1 re-agg; probability table un-hinted (AQE decides)"),
    ("window_ewma_bounded", "bounded EWMA: one user_id window exchange, O(frame) state, JVM fold"),
    ("pack_sequences_greedy", "sequence packing: per-source cumsum window — no global-order single partition"),
    ("heavy_hitter_tokens", "two-pass heavy hitters: MapInPandas MG candidates (map-only) → broadcast semi-join recount; distinct-key domain never shuffles"),
    ("variant_props_extract", "VARIANT: parse once, JVM path extraction — no Python eval, map-side only"),
    ("scd2_priority_history", "SCD2 build: lag change-detect + lead intervals over ONE (key,time) exchange"),
    ("cdc_merge_upsert", "MERGE upsert: full-outer SMJ on the key; no broadcast hint (CDC batch unbounded)"),
    ("bloom_semi_join_revenue", "bloom semi-join: bounded bitmap broadcast + 3 map-side bit-test joins ahead of the exact semi join"),
    ("join_skew_audit", "skew audit: one key-count shuffle + 1-row total broadcast + TakeOrderedAndProject"),
    ("profile_orders_columns", "column profile: ONE scan, multi-distinct expand inside the agg, 1-row explode to long format"),
    ("window_rolling_median", "rolling exact median: ONE user window exchange, frame-list sort + selection, no UDF"),
    ("entropy_event_mix", "entropy audit: (key,type) partial agg + bounded-array fixed-order fold, all JVM"),
    ("setsim_prefix_pairs", "prefix-filter ssjoin: persisted shingles, rarity window per doc (no global sort), prefix×prefix equijoin, candidates-only verify"),
    ("regression_price_on_qty", "grouped OLS: ONE partial/final moment aggregation, closed-form doubles map-side"),
    ("attribution_last_touch", "last-touch attribution: forward-fill carry over ONE user window exchange — no touches×purchases self-join"),
    ("text_bm25_rank", "BM25: term filter BEFORE the explode shuffle; df table un-hinted (3 rows — AQE broadcasts); TakeOrderedAndProject top-k"),
    ("dq_expectations_orders", "DQ suite: ALL single-table checks in ONE conditional-count scan + one left-anti RI count"),
    ("target_encode_loo", "LOO target encoding: ONE whole-partition category window — no join, exact-decimal sums"),
    ("decayed_user_activity", "half-life decay: map-side integer 2^k weights + one user groupBy — plain-count shuffle shape"),
    ("bootstrap_ci_revenue", "Poisson bootstrap: map-side x50 explode + 50-group partial agg (q1 shape) + 50-row rank window"),
    ("cusum_changepoint_daily", "CUSUM: day-grain agg first; ordered scan + exact decimal x integer statistic over the bounded daily summary"),
    ("ks_binned_click_view", "binned KS: map-side bin + <=256-cell agg; CDF window over the bounded summary only"),
    ("dedup_incremental_bloom", "incremental dedup: bloom bitmap broadcast + map-side probes; definitely-new rows shuffle-free, exact anti join on the maybe sliver only"),
    ("corpus_overlap_sources", "source overlap: codegen lead() k-grams, ONE vocabulary collect_set agg reused by both consumers (r10: checkpoint dropped), per-shingle pair explode — no self-join"),
    ("text_tfidf_top_terms", "TF-IDF: ONE (doc,len,term) tf exchange shared by df branch and scoring join (r10: cnt-referencing df agg blocks pruning divergence; checkpoint dropped)"),
    ("q15_top_supplier", "TPC-H Q15: revenue exchange reused by MAX branch and winner filter (r10: isnotnull alignment); 1-row broadcast max"),
    ("dedup_semantic_semdedup", "SemDeDup: map-side Arrow centroid assignment + ONE cluster-id exchange into the greedy prune"),
    ("text_quality_linear_score", "linear quality scorer: token explode + hash-weight map-side, one doc-keyed partial agg"),
    ("inverted_index_postings", "r10 counts-first index, single scan: shared (term,did) preagg stage reused by counts AND postings branches (tf>=1 pushdown barrier); broadcast LeftSemi; postings for 50 terms only"),
]


def main() -> None:
    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    sf_dir = "/root/testdata/sf0.001"
    spark = get_session("dump-plans")
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        "Regenerate with `python tools/dump_plans.py` (sf0.001 inputs; plan",
        "shape is scale-invariant).  The properties asserted in",
        "`tests/test_plans.py` are visible here: `PushedFilters` at the scan,",
        "pruned `ReadSchema`, `BroadcastHashJoin` on dims, bounded",
        "`Exchange` count, `TakeOrderedAndProject` for top-k.",
        "",
    ]
    for name, note in QUERIES:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # trim exchange ids / locations noise for readability
        plan = re.sub(r"file:[^,\]]+", "<path>", plan)
        out.append(f"## {name}\n\n*{note}*\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
