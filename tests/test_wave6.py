"""Pins for the wave-6 analytics (semantic invariants beside the oracle
value-hash): CUSUM telescoping/peak, seasonal-index mass balance,
bootstrap CI ordering, bitmap-vs-builtin distinct parity, repetition
metric bounds, robust-scale centering."""

from __future__ import annotations

import pytest


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_cusum_telescopes_to_zero_and_flags_peak(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        cusum_changepoint_daily,
    )

    rows = sorted(_rows(cusum_changepoint_daily(spark, sf_dir)), key=lambda r: r["day"])
    # CUSUM telescopes: last value Σ(y_i − ȳ) over all days = 0
    assert rows[-1]["cusum_m"] == pytest.approx(0.0, abs=1e-6)
    peaks = [r for r in rows if r["is_peak"]]
    assert len(peaks) >= 1
    top = max(abs(r["cusum_m"]) for r in rows)
    for p in peaks:
        assert abs(p["cusum_m"]) == pytest.approx(top, abs=1e-6)


def test_seasonality_index_weighted_mean_is_one(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        seasonality_dow_index,
    )

    rows = _rows(seasonality_dow_index(spark, sf_dir))
    assert sorted(r["weekday_mon0"] for r in rows) == list(range(7))
    n = sum(r["n_orders"] for r in rows)
    # Σ n_d · idx_d / n = Σ n_d·avg_d / (n·avg_all) = 1
    weighted = sum(r["n_orders"] * r["seasonal_index"] for r in rows) / n
    assert weighted == pytest.approx(1.0, abs=1e-4)


def test_wow_growth_first_week_null_rest_finite(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        wow_growth_weekly,
    )

    rows = sorted(_rows(wow_growth_weekly(spark, sf_dir)), key=lambda r: r["week"])
    assert rows[0]["wow_growth"] is None
    assert all(r["wow_growth"] is not None for r in rows[1:])
    # growth consistency: rev_t = rev_{t-1} * (1 + g_t)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["revenue"] == pytest.approx(
            prev["revenue"] * (1 + cur["wow_growth"]), rel=1e-4
        )


def test_bitmap_distinct_matches_builtin(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        bitmap_distinct_users,
    )
    from dask_ssh_docker_spark.sources import load_table
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: r["n_users"]
        for r in _rows(bitmap_distinct_users(spark, sf_dir))
    }
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        bootstrap_ci_revenue,
    )

    r = _rows(bootstrap_ci_revenue(spark, sf_dir))[0]
    assert r["n_replicates"] == 50
    assert r["ci_lo"] < r["ci_hi"]
    # Poisson bootstrap of an iid mean: CI brackets the point estimate
    assert r["ci_lo"] < r["point_mean"] < r["ci_hi"]
    # CI width sanity: within ±10% of the mean for n≥1.5k orders
    assert (r["ci_hi"] - r["ci_lo"]) / r["point_mean"] < 0.2


def test_bootstrap_is_deterministic_across_runs(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        bootstrap_ci_revenue,
    )

    a = _rows(bootstrap_ci_revenue(spark, sf_dir))[0]
    b = _rows(
        bootstrap_ci_revenue(spark, sf_dir).repartition(7)
    )[0]
    assert a == b  # md5-seeded weights: partitioning-independent


def test_top_bigram_coverage_bounds(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        text_top_bigram_coverage,
    )
    from dask_ssh_docker_spark.sources import load_table

    rows = _rows(text_top_bigram_coverage(spark, sf_dir))
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .filter("text IS NOT NULL AND length(trim(text)) > 0")
        .count()
    )
    assert len(rows) == n_docs  # every tokenizable doc scored
    for r in rows:
        assert r["top_bigram_n"] >= 1
        # 2·mc/dl can exceed 1 only for degenerate single-token repeats
        # of a 2-token doc; bounded by 2 always
        assert 0 < r["top_bigram_coverage"] <= 2.0


def test_robust_scale_centers_median_at_zero(spark, sf_dir):
    from dask_ssh_docker_spark.queries.advanced_analytics import (
        feature_robust_scale,
    )
    import numpy as np

    rows = _rows(feature_robust_scale(spark, sf_dir))
    by_pri = {}
    for r in rows:
        by_pri.setdefault(r["o_orderpriority"], []).append(r["robust_scaled"])
    for pri, vals in by_pri.items():
        med = float(np.median(np.array(vals)))
        assert med == pytest.approx(0.0, abs=1e-6), pri
        # IQR of the scaled values is 1 by construction
        q75, q25 = np.percentile(np.array(vals), [75, 25])
        assert (q75 - q25) == pytest.approx(1.0, abs=1e-3), pri
