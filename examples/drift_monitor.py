"""Data-health / drift monitoring report (wave-5/6 analytics composed):

    orders + events
      → PSI drift of the order-price distribution across a date split
      → binned two-sample KS between click and view value distributions
      → CUSUM changepoint scan over daily revenue (peak day flagged)
      → day-of-week seasonal index + week-over-week growth trend
      → Benford first-digit anomaly screen
      → one compact health-report parquet per section

Run:  PYTHONPATH=. python -m dask_ssh_docker_spark.runner \
          examples/drift_monitor.py -- [sf_dir] [out_dir]

Every section is a bounded-summary aggregation (fixed bins, day grain,
digit grain) — the report costs one scan per source table at any corpus
size; see SCALE.md for the per-operator shuffle shapes.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    spark = SparkSession.getActiveSession()
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else tempfile.mkdtemp(prefix="health_")

    from dask_ssh_docker_spark.queries.advanced_analytics import (
        cusum_changepoint_daily,
        seasonality_dow_index,
        wow_growth_weekly,
    )
    from dask_ssh_docker_spark.queries.stats_tests import (
        benford_price_digits,
        ks_binned_click_view,
        psi_price_drift,
    )

    sections = {
        "psi_price_drift": psi_price_drift,
        "ks_click_view": ks_binned_click_view,
        "cusum_daily_revenue": cusum_changepoint_daily,
        "seasonality_dow": seasonality_dow_index,
        "wow_growth": wow_growth_weekly,
        "benford_digits": benford_price_digits,
    }
    for name, fn in sections.items():
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")

    # one-line console summary: total PSI, KS D, changepoint day
    psi = (
        spark.read.parquet(f"{out_dir}/psi_price_drift")
        .agg(F.sum("psi_term").alias("psi"))
        .collect()[0]["psi"]
    )
    ks = spark.read.parquet(f"{out_dir}/ks_click_view").collect()[0]["ks_d"]
    peak = (
        spark.read.parquet(f"{out_dir}/cusum_daily_revenue")
        .filter("is_peak")
        .orderBy("day")
        .limit(1)
        .collect()[0]["day"]
    )
    print(
        f"health-report: psi={psi:.4f} ks_d={ks:.4f} "
        f"changepoint={peak} out={out_dir}"
    )
    return 0
