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
# window rotates every round so no query's newest driver row goes stale
# (VERDICT r3 item 3).  Round-4 window, in order:
#   1. queries CHANGED this round (must re-prove green):
#      window_ewma_bounded / anomaly_zscore_ewma (bitwise-identical EWMA
#      divisor), window_rolling_corr (NaN→NULL normalization),
#   2. queries NEW this round (scale-path dedup CC, real PNG/audio
#      decode, HLL rollup cascade — rows-only by nature — plus PageRank,
#      two-pass heavy hitters, the VARIANT surface, the XML round trip,
#      streaming watermark dedup + rate cap, SSSP, PQ ANN, the CDC
#      merge/SCD2 pair, triangle counts, and the robust-stats audits —
#      all oracle-bearing except the rows-only-by-nature ones),
#   3. the second new-query wave (never driver-checked — new queries
#      outrank stale-but-once-green ones): prefix-filter set-similarity
#      join, the stats-inference suite, sequence mining, BM25/inverted
#      index, weighted WOR sampling, stream-static enrich;
#   4-6. the third/fourth/fifth/sixth new waves from the later r4
#      sessions: two-sample tests (binned KS / Mann-Whitney), drift
#      audits (PSI / Benford / CUSUM), feature engineering (LOO target
#      encoding / signed hashing / decayed activity / robust scaling),
#      Brown smoothing, seasonality + WoW, bitmap exact-distinct,
#      Poisson-bootstrap CI, top-bigram coverage, MMR re-rank, LPA
#      communities, conversion latency, streaming PSI drift, canonical
#      dedup survivors, Pareto front, funnel trend, audience overlap,
#      RFM, ABC — the window is now EXACTLY 50 names, all either
#      changed or brand-new this round.
# Displaced to the r5 rotation (each keeps an in-window kin sharing its
# machinery, plus its own pytest pins): decode_audio↔decode_image,
# variant_shred↔variant_props, sssp/triangles↔pagerank/LPA,
# trigram/markov↔attribution, inverted_index/heavy_hitters↔bm25,
# snapshot_diff/scd2↔cdc_merge, winsorize↔robust_mad, grouping_sets↔
# rollup/cube kin, dq_expectations↔profile machinery, mv/k-per-group/
# rolling-median/mode/npy/rate-cap/dedup-watermark → pytest-pinned kin;
# the r1 cohort (44 names whose newest driver row is round 1, re-proved
# in every full local sweep this round) leads r5 after those.
# Names not listed keep their import order after the listed ones.
# ---------------------------------------------------------------------------

_PRIORITY = [
    # -- changed this round: re-prove first --
    "window_ewma_bounded",
    "anomaly_zscore_ewma",
    "window_rolling_corr",
    # -- new this round --
    "dedup_clusters_minhash_cc",
    "multimodal_decode_image",
    "rollup_cascade_daily_hll",
    "pagerank_nation_trade",
    "variant_props_extract",
    "read_xml_roundtrip",
    "cdc_merge_upsert",
    "robust_outliers_mad",
    "bloom_semi_join_revenue",
    # -- new, second wave this round (stats inference, sequence mining,
    #    retrieval, prefix-filter ssjoin, weighted WOR sampling, DQ gate,
    #    stream-static enrich, grouping sets) --
    "setsim_prefix_pairs",
    "regression_price_on_qty",
    "chisq_flag_status",
    "gini_revenue_concentration",
    "acf_daily_revenue",
    "attribution_last_touch",
    "text_bm25_rank",
    "sample_weighted_wor",
    "stream_static_enrich",
    # -- new, third wave this round (two-sample tests, drift/anomaly
    #    audits, feature engineering, trend smoothing, MMR re-rank) --
    "ks_binned_click_view",
    "mannwhitney_click_view",
    "psi_price_drift",
    "benford_price_digits",
    "target_encode_loo",
    "feature_hash_signed",
    "decayed_user_activity",
    "holt_brown_forecast",
    "sim_mmr_rerank",
    # -- new, fourth wave this round (changepoint, seasonality, bitmap
    #    exact-distinct, Poisson-bootstrap CI, Gopher repetition metric,
    #    robust scaling) --
    "cusum_changepoint_daily",
    "seasonality_dow_index",
    "wow_growth_weekly",
    "bitmap_distinct_users",
    "bootstrap_ci_revenue",
    "text_top_bigram_coverage",
    "feature_robust_scale",
    # -- new, fifth wave this round (LPA communities, conversion latency,
    #    streaming PSI drift monitor, canonical dedup survivors) --
    "label_propagation_communities",
    "conversion_latency_quantiles",
    "stream_psi_drift",
    "dedup_canonical_survivors",
    # -- new, sixth wave this round (skyline, funnel trend, audience
    #    overlap) --
    "pareto_front_orders",
    "funnel_weekly_trend",
    "audience_overlap_pairs",
    "rfm_customer_segments",
    "abc_part_classification",
    "text_pmi_cooccurrence",
    "interarrival_stats_per_user",
    "gdpr_cascade_delete_audit",
    "seasonal_decompose_daily",
    # -- displaced to the r5 window (each keeps an in-window kin sharing
    #    its machinery: decode_audio↔decode_image, variant_shred↔
    #    variant_props, sssp↔pagerank/triangles, trigram/markov↔
    #    attribution, inverted_index/heavy_hitters↔bm25, snapshot_diff/
    #    scd2↔cdc_merge, winsorize↔robust_mad, mv/profile/k-per-group/
    #    rolling-median/mode/npy → pytest-pinned kin) plus the r1
    #    cohort, keeping import order --
    "q1_pricing_summary",
    "join_semi_orders",
    "join_anti_customers",
    "join_left_order_counts",
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
    "join_full_outer",
    "union_missing_columns",
    "merge_indicator",
    "explode_outer_null_preserving",
    "str_functions",
    "str_split_explode",
    "date_functions",
    "json_extract_props",
    "cast_surface",
    "str_functions_extended",
    "fuzzy_levenshtein_pairs",
    "numeric_format_conv",
    "window_ranking",
    "window_lag_lead",
    "window_cumsum",
    "window_rolling_rows",
    "resample_hourly",
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
