"""Analytics-surface tour: the time-series + similarity operators a
reference user would reach for, composed end-to-end (SURVEY.md §2.D/I/H).

    events    → as-of join of each 'view' to its user's latest 'click'
              → hourly rollup partials → daily re-aggregation (no raw re-scan)
    embeddings → seeded-sample IVF training → nprobe ANN top-k
              → LSH top-k cross-check (overlap reported)

Run:  PYTHONPATH=. python -m dask_ssh_docker_spark.runner \
          examples/analytics_tour.py -- [sf_dir]
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    spark = SparkSession.getActiveSession()
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from dask_ssh_docker_spark.operators.asof import merge_asof
    from dask_ssh_docker_spark.operators.ivf import (
        build_index,
        ivf_topk,
        train_centroids,
    )
    from dask_ssh_docker_spark.operators.rollup_cascade import (
        reaggregate,
        rollup_hourly,
    )
    from dask_ssh_docker_spark.operators.similarity import lsh_topk
    from dask_ssh_docker_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")

    # 1. as-of: each view joined to the user's most recent click (1 shuffle)
    views = ev.filter("event_type = 'view'").select("user_id", "ts", "event_id")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    matched = merge_asof(views, clicks, on="ts", by="user_id")
    n_matched = matched.filter("click_value IS NOT NULL").count()

    # 2. rollup cascade: hourly partials once, daily answers from partials
    hourly = rollup_hourly(ev)
    daily = reaggregate(hourly, bucket="1 day")
    n_daily = daily.count()

    # 3. ANN: sample-trained IVF vs LSH, overlap vs each other
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter("vec_id >= 5").select("vec_id", "embedding").persist()
    cents = train_centroids(corpus, k=8, iters=2, sample_fraction=0.8)
    idx = build_index(corpus, cents)
    ivf_hits = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(queries, idx, cents, k=10, nprobe=4).collect()
    }
    lsh_hits = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(queries, corpus, k=10, bits=6, tables=16, dim=64).collect()
    }
    overlap = len(ivf_hits & lsh_hits)

    # 4. smoothing, dense resample, retention — the monitoring trio over
    #    the same events table (all single-exchange or spine-join shapes)
    from dask_ssh_docker_spark.queries.analytics_extra import (
        resample_hourly_gapfill,
        retention_cohorts_weekly,
        window_ewma_bounded,
    )

    n_smoothed = window_ewma_bounded(spark, sf_dir).count()
    n_gaps = (
        resample_hourly_gapfill(spark, sf_dir).filter("gap_filled = 1").count()
    )
    n_cohort_cells = retention_cohorts_weekly(spark, sf_dir).count()

    print(
        f"TOUR asof_matched={n_matched} daily_buckets={n_daily} "
        f"ivf_hits={len(ivf_hits)} lsh_hits={len(lsh_hits)} overlap={overlap} "
        f"ewma_rows={n_smoothed} gaps_filled={n_gaps} "
        f"cohort_cells={n_cohort_cells}"
    )
    return 0
