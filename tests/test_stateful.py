"""applyInPandasWithState: state genuinely persists across micro-batches
(two-file source, one file per trigger → 2 batches; final per-user state
must equal the global batch aggregate)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_running_totals_across_two_batches(spark, tmp_path):
    from dask_ssh_docker_spark.sources import load_table
    from dask_ssh_docker_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value", "event_id"
    )
    # two parquet files => two micro-batches with maxFilesPerTrigger=1
    src = tmp_path / "src"
    ev.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(src / "a"))
    ev.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = running_user_totals(stream)
    name = "stateful_probe"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name).toPandas()
    # at least one user must have been updated twice (two batches)
    assert got.groupby("user_id").size().max() >= 2
    final = got.groupby("user_id").last()  # memory sink appends in batch order

    expected = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    final = final.sort_index()
    pd.testing.assert_series_equal(
        final["n"].astype("int64"), expected["n"].astype("int64"), check_names=False
    )
    assert (abs(final["total"] - expected["total"]) < 1e-6).all()


def test_streaming_ewma_matches_batch_fold(spark, tmp_path):
    """One-batch stream: the stateful EWMA equals the per-user recursive
    fold computed driver-side; two-batch stream: state carries over (same
    final value)."""
    import math

    from dask_ssh_docker_spark.sources import load_table
    from dask_ssh_docker_spark.streaming.stateful import streaming_ewma

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value", "event_id"
    )
    alpha = 0.1
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        s = None
        for x in grp["value"].astype(float):
            s = x if s is None else (1 - alpha) * s + alpha * x
        want[uid] = s

    src = tmp_path / "src"
    ev.orderBy("ts").coalesce(1).write.parquet(str(src / "a"))
    stream = spark.readStream.schema(ev.schema).parquet(f"{src}/*")
    out = streaming_ewma(stream, alpha=alpha)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ewma_probe").toPandas().groupby("user_id").last()
    assert set(got.index) == set(want)
    for uid, row in got.iterrows():
        assert math.isclose(row["ewma"], want[uid], rel_tol=1e-9), uid


def test_rate_cap_across_two_batches(spark, tmp_path):
    """Cap persists across micro-batches: a user capped in batch 1 emits
    nothing in batch 2; a user under quota tops up to exactly n."""
    from dask_ssh_docker_spark.streaming.stateful import rate_cap_per_key

    rows = []
    # user 1: 4 events in batch a, 3 in batch b → cap 5 = 4 + 1
    # user 2: 2 events in batch a, 1 in batch b → all 3 pass
    for i in range(4):
        rows.append((1, 100 + i, f"2024-01-01 00:00:{i:02d}", "a"))
    for i in range(3):
        rows.append((1, 200 + i, f"2024-01-01 01:00:{i:02d}", "b"))
    for i in range(2):
        rows.append((2, 300 + i, f"2024-01-01 00:00:{i:02d}", "a"))
    rows.append((2, 400, "2024-01-01 01:00:00", "b"))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "batch"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)

    src = tmp_path / "src"
    df.filter("batch = 'a'").drop("batch").coalesce(1).write.parquet(str(src / "a"))
    df.filter("batch = 'b'").drop("batch").coalesce(1).write.parquet(str(src / "b"))
    schema = df.drop("batch").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = rate_cap_per_key(stream, n=5)
    q = (
        out.writeStream.format("memory")
        .queryName("rate_cap_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("rate_cap_probe").toPandas()
    by_user = got.groupby("user_id")["event_id"].apply(set).to_dict()
    assert len(by_user[1]) == 5 and {100, 101, 102, 103} <= by_user[1]
    # the 5th slot goes to exactly one batch-b event for user 1
    assert len(by_user[1] & {200, 201, 202}) == 1
    assert by_user[2] == {300, 301, 400}
