"""Sub-bucketed sequence windows equal their global-window shapes
(SCALE.md class-7 mitigation, VERDICT r11 item 2).

- merge_asof(bucket_width=…) and interpolate_linear(bucket_width_s=…)
  must be BIT-identical for any width (carries copy payloads, never
  recompute).
- subbucket_with_tail restores trailing-ROWS frames exactly under its
  density precondition (every present bucket ≥ tail rows); a
  constructed violation shows where the precondition matters.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _sorted_rows(df):
    return sorted(
        (
            tuple(None if v != v else v for v in r)
            if any(isinstance(v, float) for v in r)
            else tuple(r)
            for r in (tuple(row) for row in df.collect())
        ),
        key=repr,  # total order even when None mixes with datetimes
    )


@pytest.fixture(scope="module")
def frames(spark):
    """Uniform + bot-user event frames: 40 users, one of them holding
    ~25% of all rows; irregular timestamps; values with planted nulls."""
    rng = np.random.default_rng(7)
    n = 12_000
    user = np.where(rng.random(n) < 0.25, 0, rng.integers(1, 40, n))
    # unique micros (interpolate orders by t alone — equal stamps would
    # make even the PLAIN operator tie-order-dependent)
    ts = rng.integers(0, 3_600 * 48, n) * 1_000_000 + np.arange(n)
    val = rng.normal(50, 10, n)
    val[rng.random(n) < 0.3] = np.nan
    left = pd.DataFrame(
        {
            "user_id": user,
            "ts": pd.to_datetime(ts, unit="us"),
            "event_id": np.arange(n),
            "value": val,
        }
    )
    m = 3_000
    r_user = np.where(rng.random(m) < 0.25, 0, rng.integers(1, 40, m))
    right = pd.DataFrame(
        {
            "user_id": r_user,
            "ts": pd.to_datetime(rng.integers(0, 3_600 * 48, m) * 1_000_000, unit="us"),
            "quote_id": np.arange(m),
            "px": rng.normal(100, 5, m).round(4),
        }
    )
    ldf = spark.createDataFrame(left).withColumn(
        # pandas NaN arrives as double NaN, not SQL NULL — convert, so
        # null-handling paths (interpolate, ignorenulls fills) engage
        "value",
        F.when(F.isnan("value"), F.lit(None)).otherwise(F.col("value")),
    )
    return ldf, spark.createDataFrame(right)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_bucketed_bitwise_equal(spark, frames, direction):
    from dask_ssh_docker_spark.operators.asof import merge_asof

    left, right = frames
    base = merge_asof(
        left, right, on="ts", by="user_id", direction=direction,
        tiebreak="quote_id",
    )
    for width_s in (600, 7_200):
        got = merge_asof(
            left, right, on="ts", by="user_id", direction=direction,
            tiebreak="quote_id", bucket_width=width_s,
        )
        assert _sorted_rows(got) == _sorted_rows(base), (direction, width_s)


def test_asof_bucketed_no_exact_matches_and_tolerance(spark, frames):
    from dask_ssh_docker_spark.operators.asof import merge_asof

    left, right = frames
    kw = dict(
        on="ts", by="user_id", direction="backward", tiebreak="quote_id",
        allow_exact_matches=False, tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    base = merge_asof(left, right, **kw)
    got = merge_asof(left, right, bucket_width=900, **kw)
    assert _sorted_rows(got) == _sorted_rows(base)


def test_interpolate_bucketed_bitwise_equal(spark, frames):
    from dask_ssh_docker_spark.operators.interpolate import interpolate_linear

    left, _ = frames
    base = interpolate_linear(left, "ts", "value", by="user_id")
    for width_s in (600, 7_200):
        got = interpolate_linear(
            left, "ts", "value", by="user_id", bucket_width_s=width_s
        )
        assert _sorted_rows(got.select(*base.columns)) == _sorted_rows(base), width_s


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_bucketed_keeps_null_keys_and_null_on(spark, direction):
    """NULL `by` keys and NULL `on` timestamps are real rows the global
    window keeps (NULLs sort first/last in the per-key order) — the
    bucketed carry joins are null-safe, so those rows must neither vanish
    nor diverge (ADVICE r12: the plain equi-join dropped them)."""
    from dask_ssh_docker_spark.operators.asof import merge_asof

    def ts(s):
        return None if s is None else datetime(1970, 1, 1) + timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            (1, ts(100), 0), (1, ts(5_000), 1), (1, None, 2),
            (None, ts(200), 3), (None, ts(9_000), 4), (None, None, 5),
            (2, ts(300), 6),
        ],
        "user_id int, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [
            (1, ts(90), 10, 1.0), (1, ts(4_500), 11, 2.0),
            (None, ts(150), 12, 3.0), (None, ts(8_000), 13, 4.0),
            (None, None, 14, 5.0),
            (2, None, 15, 6.0),
        ],
        "user_id int, ts timestamp, quote_id int, px double",
    )
    base = merge_asof(
        left, right, on="ts", by="user_id", direction=direction,
        tiebreak="quote_id",
    )
    assert base.count() == 7  # all left rows survive the global path
    for width_s in (600, 3_600):
        got = merge_asof(
            left, right, on="ts", by="user_id", direction=direction,
            tiebreak="quote_id", bucket_width=width_s,
        )
        assert _sorted_rows(got) == _sorted_rows(base), (direction, width_s)


def test_asof_bucketed_forward_null_tiebreak(spark):
    """Forward cross-bucket carry with NULL tiebreaks: the within-bucket
    fill orders desc_nulls_first(__tb) (last = smallest NON-NULL __tb),
    so the carry's min_by must also prefer non-null tiebreaks at equal
    `on` (ADVICE r12: a bare min_by struct treated NULL as smallest and
    carried the wrong payload)."""
    from dask_ssh_docker_spark.operators.asof import merge_asof

    t0 = datetime(1970, 1, 1)
    t_match = t0 + timedelta(seconds=5_000)  # bucket 1 at width 3600
    left = spark.createDataFrame(
        [(1, t0, 0)], "user_id int, ts timestamp, event_id int"
    )
    # two right rows at the SAME ts in a LATER bucket: NULL tiebreak vs
    # tiebreak 7 — the global forward fill picks the non-null one
    right = spark.createDataFrame(
        [(1, t_match, None, 111.0), (1, t_match, 7, 222.0)],
        "user_id int, ts timestamp, quote_id int, px double",
    )
    kw = dict(on="ts", by="user_id", direction="forward", tiebreak="quote_id")
    base = merge_asof(left, right, **kw)
    got = merge_asof(left, right, bucket_width=3_600, **kw)
    assert _sorted_rows(got) == _sorted_rows(base)
    assert got.first()["px"] == 222.0  # the non-null-tiebreak payload


def test_interpolate_bucketed_keeps_null_keys(spark):
    """NULL `by` keys / NULL ts survive the bucketed interpolate path
    bit-identically (same null-safe carry join as asof)."""
    from dask_ssh_docker_spark.operators.interpolate import interpolate_linear

    epoch = datetime(1970, 1, 1)
    rows = [
        (1, epoch + timedelta(seconds=i), i, float(i) if i % 3 else None)
        for i in range(0, 12_000, 100)
    ]
    rows += [(None, epoch + timedelta(seconds=50), 900, None),
             (None, epoch + timedelta(seconds=7_000), 901, 5.0),
             (2, None, 902, None), (None, None, 903, 9.0)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, value double"
    )
    base = interpolate_linear(df, "ts", "value", by="user_id")
    assert base.count() == len(rows)
    got = interpolate_linear(df, "ts", "value", by="user_id", bucket_width_s=600)
    assert _sorted_rows(got.select(*base.columns)) == _sorted_rows(base)


def test_interpolate_bucketed_out_col_overwrite(spark, frames):
    """out_col == value_col replaces the column in place on BOTH paths —
    the bucketed select must not emit the name twice (ADVICE r12)."""
    from dask_ssh_docker_spark.operators.interpolate import interpolate_linear

    left, _ = frames
    base = interpolate_linear(left, "ts", "value", by="user_id", out_col="value")
    got = interpolate_linear(
        left, "ts", "value", by="user_id", out_col="value", bucket_width_s=600
    )
    assert got.columns == base.columns
    assert len(got.columns) == len(set(got.columns))
    assert _sorted_rows(got.select(*base.columns)) == _sorted_rows(base)


def test_subbucket_tail_ewma_exact_when_dense(spark, frames):
    """Bounded-frame EWMA (the window_ewma_bounded shape) over ghost-tail
    sub-buckets equals the global window when every bucket ≥ tail rows."""
    from dask_ssh_docker_spark.operators.seqbucket import subbucket_with_tail

    left, _ = frames
    frame_n = 20
    t = F.unix_micros("ts")
    x = F.coalesce(F.col("value").cast("double"), F.lit(0.0))

    def ewma_over(part_cols, src):
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(t, "event_id")
            .rowsBetween(-(frame_n - 1), 0)
        )
        vals = F.collect_list(x).over(w)
        num = F.aggregate(vals, F.lit(0.0), lambda a, b: a * F.lit(0.9) + b)
        return src.withColumn("ewma", num)

    base = ewma_over(["user_id"], left).select("event_id", "ewma")
    # 2h buckets over 48h of 12k rows -> every (user, bucket) dense for
    # the hot user; sparse users may violate density, so restrict the
    # parity assertion to buckets that meet the precondition
    aug = subbucket_with_tail(
        left.withColumn("__t", t), ["user_id"], ["__t", "event_id"], frame_n,
        F.floor(F.col("__t") / F.lit(7_200 * 1_000_000)),
    )
    got = (
        ewma_over(["user_id", "__bkt"], aug)
        .filter(~F.col("__ghost"))
        .select("event_id", "ewma")
    )
    # density precondition: a bucket whose PREVIOUS present bucket holds
    # < tail rows receives an incomplete ghost tail — ITS first rows are
    # the ones that lose context.  Exclude exactly those buckets from the
    # parity set; everything else must be bit-identical.
    counts = aug.filter(~F.col("__ghost")).groupBy("user_id", "__bkt").count()
    wuser = Window.partitionBy("user_id").orderBy("__bkt")
    affected = counts.withColumn("prev_n", F.lag("count").over(wuser)).filter(
        F.col("prev_n").isNotNull() & (F.col("prev_n") < frame_n)
    )
    affected_keys = {(r["user_id"], r["__bkt"]) for r in affected.collect()}
    ok_events = aug.filter(~F.col("__ghost")).join(
        affected.select("user_id", "__bkt"), ["user_id", "__bkt"], "left_anti"
    ).select("event_id")
    b = {r.event_id: r.ewma for r in base.join(ok_events, "event_id").collect()}
    g = {r.event_id: r.ewma for r in got.join(ok_events, "event_id").collect()}
    assert b == g  # bit-identical where the precondition holds
    # the hot user — the key this mitigation exists for — is fully dense
    # (~125 rows/bucket >= tail), so EVERY one of its rows is in the
    # parity set; uniform users are sparse by construction (~9 rows per
    # 2 h bucket), which is exactly why one does NOT sub-bucket them
    hot_bad = [k for k in affected_keys if k[0] == 0]
    assert not hot_bad, f"hot user unexpectedly sparse: {hot_bad}"
    hot_ids = {r.event_id for r in left.filter("user_id = 0").collect()}
    assert hot_ids <= set(b), "hot-user rows missing from the parity set"


def test_recommend_bucket_width_hot_vs_uniform(spark, frames):
    """Hot-key census (VERDICT r12 item 6): a corpus with a key past the
    crossover gets a width sized to ~target rows/bucket; a uniform corpus
    gets None (don't sub-bucket).  The decision can only change the plan,
    never the output — pinned by running interpolate both ways."""
    from dask_ssh_docker_spark.operators.interpolate import interpolate_linear
    from dask_ssh_docker_spark.operators.seqbucket import recommend_bucket_width

    left, _ = frames  # user 0 holds ~25% of 12k rows over a 48h span
    # scaled-down thresholds (the production defaults assume 3M-row keys)
    w = recommend_bucket_width(
        left, "user_id", "ts", hot_rows=2_000, target_bucket_rows=500
    )
    assert w is not None
    hot_n = left.filter("user_id = 0").count()
    span = 48 * 3600
    # width ≈ span / (hot_n / target): ~500-row buckets for the hot key
    assert abs(w - span / (hot_n / 500)) / w < 0.35
    # uniform corpus (no key near the threshold) -> None
    assert (
        recommend_bucket_width(
            left.filter("user_id > 0"), "user_id", "ts", hot_rows=2_000
        )
        is None
    )
    # zero-span hot key: bucketing cannot split one instant -> None
    one_instant = left.withColumn("ts", F.lit("2020-01-01 00:00:00").cast("timestamp"))
    assert recommend_bucket_width(one_instant, "user_id", "ts", hot_rows=2_000) is None
    # the switch is output-neutral: recommended width == plain result
    base = interpolate_linear(left, "ts", "value", by="user_id")
    got = interpolate_linear(left, "ts", "value", by="user_id", bucket_width_s=w)
    assert _sorted_rows(got.select(*base.columns)) == _sorted_rows(base)


def test_subbucket_tail_precondition_violation_detected(spark):
    """A bucket with < tail rows loses context for the NEXT bucket's
    first rows — construct it and show exactly those rows differ (the
    documented precondition, not a silent wrong answer elsewhere)."""
    from dask_ssh_docker_spark.operators.seqbucket import subbucket_with_tail

    # t=5 removed: bucket 1 (width 3) holds only {3,4} — fewer than the
    # 3 preceding rows t=6's frame needs, so its ghost tail is short one
    rows = [(1, i, float(i)) for i in range(10) if i != 5]
    df = spark.createDataFrame(rows, "user_id int, t long, v double")
    aug = subbucket_with_tail(
        df, ["user_id"], ["t"], 4, F.floor(F.col("t") / F.lit(3))
    )
    w_g = Window.partitionBy("user_id").orderBy("t").rowsBetween(-3, 0)
    w_b = Window.partitionBy("user_id", "__bkt").orderBy("t").rowsBetween(-3, 0)
    base = df.withColumn("s", F.sum("v").over(w_g)).select("t", "s")
    got = (
        aug.withColumn("s", F.sum("v").over(w_b))
        .filter(~F.col("__ghost"))
        .select("t", "s")
    )
    bmap = {r.t: r.s for r in base.collect()}
    gmap = {r.t: r.s for r in got.collect()}
    diff = {t for t in bmap if bmap[t] != gmap[t]}
    # t=6's global frame is {2,3,4,6}; the ghost tail of bucket 1 only
    # carries {3,4} (t=2 lives two buckets back, ghosts do not cascade
    # transitively) -> exactly t=6 diverges, nothing else
    assert diff == {6}, diff


def test_recommend_bucket_width_date_axis_in_days(spark):
    """Date on_col returns DAYS (merge_asof's unix_date bucket axis), not
    seconds — a seconds-scaled width would size buckets 86400x finer than
    the target; and the recommended width reproduces the plain asof
    result exactly on the date axis."""
    from dask_ssh_docker_spark.operators.asof import merge_asof
    from dask_ssh_docker_spark.operators.seqbucket import recommend_bucket_width

    # one hot key: 2000 rows over ~400 days; target 100-row buckets
    left = spark.createDataFrame(
        [(1, i % 400, float(i)) for i in range(2000)],
        "k int, d int, v double",
    ).select("k", F.date_add(F.lit("2020-01-01").cast("date"), F.col("d")).alias("d"), "v")
    w = recommend_bucket_width(left, "k", "d", hot_rows=1_000, target_bucket_rows=100)
    # span 399 days / (2000/100 buckets) ~ 20 days — a DAYS-unit answer;
    # the seconds-unit bug would return ~1.7e6
    assert w is not None and 10 <= w <= 40
    right = left.groupBy("k", "d").agg(F.avg("v").alias("q"))
    base = merge_asof(left, right, on="d", by="k")
    bucketed = merge_asof(left, right, on="d", by="k", bucket_width=w)
    assert _sorted_rows(bucketed.select(*base.columns)) == _sorted_rows(base)
