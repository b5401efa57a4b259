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
# reports per-name staleness).  Round-12 window (VERDICT r11 item 1):
#   0. queries whose machinery CHANGED in r12 (canonical-survivors and
#      minhash-corpus-overlap gained DuckDB oracles — rows-only → hash;
#      stream_mv_user_totals perf work; sequence-family sub-bucketing);
#   1. ALL 38 names whose newest driver row is round 7 — the entire
#      remaining staleness tier fits in one 50-name window (the judge
#      re-proved 12 of them green in r11; the driver record should too).
#      After this window the oldest evidence anywhere is r8.
# Names not listed keep their import order after the listed ones.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- 0. machinery changed r12: re-prove first --
    "dedup_canonical_survivors",  # promoted rows-only → arg_max oracle
    "corpus_overlap_minhash",  # promoted rows-only → exact-overlap oracle
    "stream_mv_user_totals",  # r11 drift investigation (VERDICT item 5)
    "interarrival_stats_per_user",  # sequence-family skew work (item 2)
    # -- 1. the whole r7 staleness tier (34 more names; 38 total with the
    #       four above that also sit in it or carry r12 machinery) --
    "join_left_order_counts",
    "join_cross_nation_region",
    "filter_project_lineitem",
    "sample_systematic",
    "null_handling",
    "agg_global_stats",
    "agg_rollup",
    "value_counts_events",
    "agg_corr_stats",
    "topk_orders",
    "dedup_keep_first",
    "distinct_pairs",
    "set_intersect",
    "set_except",
    "concat_union",
    "delayed_api_smoke",
    "futures_api_smoke",
    "join_full_outer",
    "union_missing_columns",
    "merge_indicator",
    "explode_outer_null_preserving",
    "str_functions",
    "str_split_explode",
    "date_functions",
    "json_extract_props",
    "json_map_schema",
    "cast_surface",
    "text_quality_linear_score",
    "dedup_clusters_minhash_cc",
    "dedup_substring_dupfrac",
    "dedup_substring_excise",
    "dedup_semantic_semdedup",
    "gini_revenue_concentration",
    "mannwhitney_click_view",
    "rfm_customer_segments",
    "abc_part_classification",
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
