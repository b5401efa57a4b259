"""Rate source + foreachBatch sink (streaming §2.H depth)."""

from __future__ import annotations


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from dask_ssh_docker_spark.streaming import foreach_batch_parquet, stream_events

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    s = stream_events(spark, "/root/testdata/sf0.001")
    q = foreach_batch_parquet(s, out, ckpt)
    q.awaitTermination()

    from dask_ssh_docker_spark.sources import load_table

    got = spark.read.parquet(out)
    n_src = load_table(spark, "/root/testdata/sf0.001", "events").count()
    assert got.count() == n_src
    assert "__epoch" in got.columns


def test_rate_source_produces_rows(spark, tmp_path):
    from dask_ssh_docker_spark.streaming import rate_stream

    s = rate_stream(spark, rows_per_second=500)
    assert s.isStreaming
    q = (
        s.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "c"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_probe").count()
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
    finally:
        q.stop()


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Streaming click->purchase attribution within 30min == the same
    batch interval join."""
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.sources import load_table
    from dask_ssh_docker_spark.streaming import (
        run_to_completion,
        stream_events,
        stream_stream_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    s = stream_events(spark, sf)
    clicks = s.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = stream_events(spark, sf).filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = stream_stream_interval_join(
        clicks, purchases, "user_id", within="30 minutes"
    ).select("click_id", "purchase_id")
    got = run_to_completion(joined, output_mode="append").toPandas()

    ev = load_table(spark, sf, "events")
    bc = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    bp = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = bc.join(
        bp,
        (bc.user_id == bp.u2)
        & (bp.p_ts >= bc.c_ts)
        & (bp.p_ts <= bc.c_ts + F.expr("INTERVAL 30 MINUTES")),
    ).select("click_id", "purchase_id").toPandas()

    key = ["click_id", "purchase_id"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, batch[key].values.tolist())
    )
    assert len(batch) > 0
