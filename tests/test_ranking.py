"""operators/ranking.py: distributed rank/ntile/cumsum must equal the
single-partition-window answers bit-for-bit, with no unpartitioned
Window in their plans."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.ranking import (
    assign_quantile_buckets,
    with_global_ntile,
    with_global_row_number,
    with_global_running_sum,
)
from dask_ssh_docker_spark.plans import unpartitioned_window_count
from dask_ssh_docker_spark.sources import load_table


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    # customer-grain aggregate with real ties in the order columns
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
        )
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_row_number_matches_global_window_asc_and_desc(base):
    for asc in (True, False):
        got = with_global_row_number(
            base, [("cnt", asc), ("k", True)], out="rn", n_buckets=8
        )
        order = [F.asc("cnt") if asc else F.desc("cnt"), F.asc("k")]
        want = base.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        )
        assert _rows(got, "k", "rn") == _rows(want, "k", "rn")


def test_row_number_no_unpartitioned_window(base):
    got = with_global_row_number(base, [("cnt", True), ("k", True)], n_buckets=8)
    assert unpartitioned_window_count(got) == 0
    # sanity: the naive twin DOES have one (helper detects the bad shape)
    naive = base.withColumn(
        "rn", F.row_number().over(Window.orderBy("cnt", "k"))
    )
    assert unpartitioned_window_count(naive) == 1


def test_ntile_matches_global_window(base):
    for k in (5, 7):
        got = with_global_ntile(
            base, [("rev", True), ("k", True)], k=k, out="t", n_buckets=8
        )
        want = base.withColumn(
            "t", F.ntile(k).over(Window.orderBy(F.asc("rev"), F.asc("k")))
        )
        assert _rows(got, "k", "t") == _rows(want, "k", "t")


def test_ntile_more_tiles_than_rows(spark):
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    got = with_global_ntile(df, [("v", True), ("k", True)], k=10, out="t")
    # SQL NTILE with n < k: each row its own tile = its row number
    assert _rows(got, "k", "t") == [(0, 1), (1, 2), (2, 3)]


def test_running_sum_matches_global_window_decimal_exact(base):
    got = with_global_running_sum(
        base, [("rev", False), ("k", True)], "rev", out="cum", n_buckets=8
    ).select("k", F.col("cum").cast("decimal(18,2)").alias("cum"))
    w = Window.orderBy(F.desc("rev"), F.asc("k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = base.select(
        "k", F.sum("rev").over(w).cast("decimal(18,2)").alias("cum")
    )
    assert _rows(got, "k", "cum") == _rows(want, "k", "cum")


def test_running_sum_no_unpartitioned_window(base):
    got = with_global_running_sum(
        base, [("rev", False), ("k", True)], "rev", out="cum", n_buckets=8
    )
    assert unpartitioned_window_count(got) == 0


def test_assign_quantile_buckets_membership_and_agreement(base):
    got = assign_quantile_buckets(base, "rev", k=5, out="b", accuracy=100000)
    rows = {r["k"]: r["b"] for r in got.collect()}
    assert set(rows.values()) <= set(range(1, 6))
    # monotone in the key: sort by (rev, k) and check bucket never drops
    ordered = [
        rows[r["k"]]
        for r in base.select("k", "rev").orderBy("rev", "k").collect()
    ]
    assert all(a <= b for a, b in zip(ordered, ordered[1:]))
    # high agreement with exact NTILE (differs only at tie/sketch edges)
    exact = {
        r["k"]: r["t"]
        for r in base.withColumn(
            "t", F.ntile(5).over(Window.orderBy(F.asc("rev"), F.asc("k")))
        ).collect()
    }
    agree = sum(1 for k in rows if rows[k] == exact[k]) / len(rows)
    assert agree >= 0.95


def test_ties_stay_in_one_bucket_and_rank_deterministic(spark):
    # a frame that is ONE massive tie: every rank decided by the tiebreak
    df = spark.range(1000).select(
        F.col("id").alias("k"), F.lit(7).alias("v")
    )
    got = with_global_row_number(
        df, [("v", True), ("k", True)], out="rn", n_buckets=8
    )
    assert _rows(got, "k", "rn") == [(i, i + 1) for i in range(1000)]


def test_string_key_rejected(spark):
    # ADVICE r5: numeric-looking strings bucket numerically but window-sort
    # lexicographically ('10' < '9') — must raise, not silently mis-rank
    df = spark.createDataFrame([("9",), ("10",), ("2",)], ["s"])
    with pytest.raises(TypeError, match="string"):
        with_global_row_number(df, [("s", True)], out="rn", n_buckets=4)


def test_nan_key_ranks_greatest_both_directions(spark):
    # Spark sorts NaN greatest; the bucketing must agree under BOTH sort
    # directions (desc negation alone would strand NaN in the wrong bucket)
    rows = [(1, 5.0), (2, float("nan")), (3, 1.0), (4, 3.0), (5, float("nan"))]
    df = spark.createDataFrame(rows, ["k", "v"])
    for asc in (True, False):
        got = with_global_row_number(
            df, [("v", asc), ("k", True)], out="rn", n_buckets=4
        )
        want = df.withColumn(
            "rn",
            F.row_number()
            .over(Window.orderBy(F.asc("v") if asc else F.desc("v"), F.asc("k")))
            .cast("bigint"),
        )
        assert _rows(got, "k", "rn") == _rows(want, "k", "rn")


def test_date_and_timestamp_keys_supported(spark):
    import datetime as dt

    rows = [
        (1, dt.date(2024, 3, 1)),
        (2, dt.date(2023, 1, 15)),
        (3, dt.date(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["k", "d"])
    got = with_global_row_number(df, [("d", True), ("k", True)], out="rn", n_buckets=4)
    want = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.asc("d"), F.asc("k"))).cast("bigint"),
    )
    assert _rows(got, "k", "rn") == _rows(want, "k", "rn")
    ts = df.select("k", F.col("d").cast("timestamp").alias("t"))
    got_t = with_global_row_number(ts, [("t", True), ("k", True)], out="rn", n_buckets=4)
    want_t = ts.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.asc("t"), F.asc("k"))).cast("bigint"),
    )
    assert _rows(got_t, "k", "rn") == _rows(want_t, "k", "rn")


def test_fused_ntiles_matches_sequential_windows(base):
    from dask_ssh_docker_spark.operators.ranking import with_global_ntiles

    got = with_global_ntiles(
        base,
        [
            ([("cnt", False), ("k", True)], "a"),
            ([("rev", True), ("k", True)], "b"),
        ],
        k=5,
        n_buckets=8,
    )
    want = base.withColumn(
        "a", F.ntile(5).over(Window.orderBy(F.desc("cnt"), F.asc("k")))
    ).withColumn(
        "b", F.ntile(5).over(Window.orderBy(F.asc("rev"), F.asc("k")))
    )
    assert _rows(got, "k", "a", "b") == _rows(want, "k", "a", "b")
    assert unpartitioned_window_count(got) == 0


def test_null_key_matches_window_null_ordering(spark):
    # ADVICE r6: NULL keys previously bucketed to 0 under BOTH directions
    # while the in-bucket window sorted them NULLS LAST descending —
    # mis-ranking them between buckets.  Pinned: bucketing now agrees
    # with Spark's window null ordering (asc NULLS FIRST, desc NULLS LAST).
    rows = [(1, 5.0), (2, None), (3, 1.0), (4, None), (5, 3.0), (6, 4.5)]
    df = spark.createDataFrame(rows, "k int, v double")
    for asc in (True, False):
        got = with_global_row_number(
            df, [("v", asc), ("k", True)], out="rn", n_buckets=3
        )
        want = df.withColumn(
            "rn",
            F.row_number()
            .over(Window.orderBy(F.asc("v") if asc else F.desc("v"), F.asc("k")))
            .cast("bigint"),
        )
        assert _rows(got, "k", "rn") == _rows(want, "k", "rn")
