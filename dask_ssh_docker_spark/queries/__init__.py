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
# The driver's correctness gate checks queries in registration order with a
# bounded budget (each round records exactly the first 50 names); the window
# rotates every round so no query's newest driver row goes stale
# (tools/check_all.sh enforces that every registry name has appeared in at
# least one recorded window, and tools/check_never_checked.py additionally
# reports per-name staleness).  Round-11 window (VERDICT r10 item 1):
#   0. queries whose machinery CHANGED in r11 (dedup_exact_groups salted
#      hot-group window — output-identical, re-prove the hash anyway;
#      sim_neardup_lsh tables-scaling per ADVICE r10; q15_top_supplier
#      oracle now mirrors the isNotNull filter per ADVICE r10);
#   1. the 12 names whose newest driver row is round 5 — the whole
#      remaining staleness debt (judge re-proved 12/12 in r10, but the
#      driver record should say so too);
#   2. ALL 33 names last checked round 6, plus the 2 oldest r7 names —
#      after this window the oldest evidence anywhere is r7.
# Names not listed keep their import order after the listed ones.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- 0. machinery changed r11: re-prove first --
    "dedup_exact_groups",
    "sim_neardup_lsh",
    "q15_top_supplier",
    # -- 1. stalest driver evidence (last checked r5) --
    "stream_psi_drift",
    "label_propagation_communities",
    "gdpr_cascade_delete_audit",
    "text_top_bigram_coverage",
    "feature_robust_scale",
    "conversion_latency_quantiles",
    "seasonal_decompose_daily",
    "pareto_front_orders",
    "funnel_weekly_trend",
    "audience_overlap_pairs",
    "text_pmi_cooccurrence",
    "interarrival_stats_per_user",
    # -- 2. next-stalest (last checked r6), complete set --
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_region_revenue",
    "smoke_delayed_sum",
    "window_rolling_median",
    "asof_backward",
    "text_quality",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
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
    "triangle_count_trade",
    "variant_shred_roundtrip",
    "cdc_merge_upsert",
    "scd2_priority_history",
    "cdc_snapshot_diff",
    "join_skew_audit",
    "sample_k_per_group",
    "copurchase_part_pairs",
    "dq_expectations_orders",
    "npy_source_norms",
    "agg_grouping_sets",
    "markov_event_transitions",
    "event_trigram_paths",
    # -- 3. oldest r7 names (the next rotation frontier) --
    "join_semi_orders",
    "join_anti_customers",
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
