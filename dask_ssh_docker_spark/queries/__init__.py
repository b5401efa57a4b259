"""Driver-checked query suite (SURVEY.md §2 inventory → ``queries()``).

Every operator family from SURVEY.md §2 gets at least one registered query
here.  A registered query is a callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) a DuckDB oracle SQL string; the driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value-hash.

Determinism rules used throughout (see ``_util.py``):

- Money/measure aggregates run in exact DECIMAL arithmetic and are cast to
  DOUBLE only at the end — bit-identical across Spark and DuckDB,
  regardless of partition/accumulation order.
- Averages are computed as ``double(sum_decimal) / count`` so both engines
  perform the identical IEEE division.
- Every top-k / limit query breaks ties on a unique key.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import for registration side effects — each module registers its queries.
from . import relational  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import asof  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import udf_multimodal  # noqa: E402,F401
from . import approx_extra  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import map_funcs  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import agg_by  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import text_rank_binning  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import embeddings  # noqa: E402,F401
from . import analytics_extra  # noqa: E402,F401
from . import graph_analytics  # noqa: E402,F401
from . import semistructured  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import profiling  # noqa: E402,F401
from . import custom_source  # noqa: E402,F401
from . import stats_inference  # noqa: E402,F401
from . import sequences  # noqa: E402,F401
from . import text_search  # noqa: E402,F401
from . import stats_tests  # noqa: E402,F401
from . import mlprep  # noqa: E402,F401
from . import advanced_analytics  # noqa: E402,F401
from . import segment_analytics  # noqa: E402,F401
from . import assoc_analytics  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Registration priority.
#
# The driver's correctness gate checks queries in registration order and has
# a bounded budget (each round records exactly the first 50 names).  The
# window rotates every round so no query's newest driver row goes stale.
# Round-6 window (VERDICT r5 item 1 — the #1 ask):
#   1. the 29 registry names that have NEVER appeared in any driver
#      CORRECTNESS window across r01-r05 (computed as
#      REGISTRY - union(CORRECTNESS_r01..r05 keys)).  After this round
#      every registry entry has driver-side evidence.  tools/check_all.sh
#      now enforces this invariant (never-checked guard, VERDICT r5
#      item 2).
#   2. queries whose machinery CHANGED this round and must re-prove
#      green: the minhash-CC dedup pair (CC-loop round-trip fix,
#      VERDICT r5 item 3), the prefix-filter set-sim join (PPJoin
#      length filter, item 5), the four global-ranking consumers
#      (ranking.py dtype/edge-consistency hardening, ADVICE r5), the
#      ANN family (sf0.1 recall pins, item 8), and the delayed smoke
#      (futures surface wrappers, item 7).
#   3. flagship r1 anchors to keep a fresh driver row on the bench
#      headliners (q1/q3/q5, exact dedup, as-of, TF-IDF, quality).
# Names not listed keep their import order after the listed ones.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- 1. never driver-checked before r6 (29 names) --
    "delayed_api_smoke",
    "window_rolling_median",
    "sim_topk_pq",
    "stream_dedup_watermark",
    "stream_rate_cap_user",
    "stream_mv_user_totals",
    "multimodal_decode_audio",
    "multimodal_image_features",
    "agg_mode_per_group",
    "feature_minmax_scale",
    "winsorize_bounds_audit",
    "entropy_event_mix",
    "ab_test_welch",
    "heavy_hitter_tokens",
    "sssp_nation_trade",
    "triangle_count_trade",
    "variant_shred_roundtrip",
    "scd2_priority_history",
    "cdc_snapshot_diff",
    "profile_orders_columns",
    "join_skew_audit",
    "sample_k_per_group",
    "copurchase_part_pairs",
    "dq_expectations_orders",
    "npy_source_norms",
    "agg_grouping_sets",
    "markov_event_transitions",
    "event_trigram_paths",
    "inverted_index_postings",
    # -- 2. machinery changed this round: re-prove --
    "dedup_clusters_minhash_cc",
    "dedup_canonical_survivors",
    "setsim_prefix_pairs",
    "gini_revenue_concentration",
    "rfm_customer_segments",
    "abc_part_classification",
    "mannwhitney_click_view",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_bruteforce",
    "smoke_delayed_sum",
    "futures_api_smoke",  # NEW r6: Client submit/map/scatter/gather
    # -- 3. flagship anchors (bench headliners) --
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_region_revenue",
    "dedup_exact_groups",
    "asof_backward",
    "text_tfidf_top_terms",
    "text_quality",
    "pagerank_nation_trade",
    "cdc_merge_upsert",
    "text_bm25_rank",
]


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # a typo/rename here silently defeats the driver window
        raise RuntimeError(f"_PRIORITY names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def spark_queries():
    """dict name -> (spark, sf_dir) -> DataFrame, for ``__spark_entry__``."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_queries():
    """dict name -> DuckDB oracle SQL (only SQL-expressible entries)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
