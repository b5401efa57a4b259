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
