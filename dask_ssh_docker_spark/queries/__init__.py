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
# reports per-name staleness).  Round-9 window (VERDICT r8 item 4 —
# rotate the 60 queries last driver-checked ≥5 rounds ago):
#   0. queries whose machinery CHANGED in r9 (lsh candidate-exchange pin
#      dropped after the sf1 per-site audit; validation_cap bound-probe
#      short-circuit; minhash signature + bootstrap uniform A/B targets);
#   1. all 20 names whose newest driver row is round 2 (the oldest
#      evidence in the registry), in registry order;
#   2. fill to 50 with the oldest r3-checked names in registry order.
# This covers 44 of the 60 stale names; the remaining 16 r3/r5 names
# rotate in next round.  Names not listed keep their import order after
# the listed ones.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- 0. machinery changed r9: re-prove first --
    "dedup_minhash_clusters",
    "bootstrap_ci_revenue",
    "sim_topk_lsh",
    "dedup_jaccard_pairs",
    "dedup_clusters_transitive",
    "sim_neardup_pairs",
    # -- 1. stalest driver evidence (last checked r2) --
    "group_quantiles_exact",
    "subq_scalar_small_orders",
    "subq_exists_bulk",
    "subq_not_in_parts",
    "subq_having_big_customers",
    "sql_api_window_share",
    "map_functions_props",
    "pivot_returnflag",
    "melt_unpivot",
    "sort_global",
    "categorical_encode",
    "get_dummies_segment",
    "groupby_transform_scale",
    "agg_first_last_by_time",
    "q6_forecast_revenue",
    "q10_returned_revenue",
    "q12_shipmode_priority",
    "q14_promo_share",
    "q19_disjunctive_predicates",
    "histogram_order_prices",
    # -- 2. next-stalest (last checked r3) --
    "array_higher_order",
    "funnel_view_click_purchase",
    "dedup_simhash_pairs",
    "sim_neardup_lsh",
    "stream_interval_join_pairs",
    "stream_hourly_ohlc",
    "stream_sessionize",
    "multimodal_decode_stub",
    "approx_distinct_quantiles",
    "text_chunk_windows",
    "split_train_val_md5",
    "sample_stratified_by_source",
    "sample_temperature_sqrt",
    "pack_sequences_greedy",
    "text_pii_redaction",
    "top_terms_per_source",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_suppliers",
    "q13_customer_distribution",
    "q15_top_supplier",
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
