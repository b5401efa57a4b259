"""Window functions & time-series ops (SURVEY.md §2.I, §2.H batch windows).

Dask's ``rolling`` / ``resample`` / ``shift`` / ``groupby.cumcount`` surface
([Dask public API]) → Spark window frames and ``F.window`` /
``session_window`` event-time buckets.  All ordering keys include a unique
tiebreak (``event_id``/``o_orderkey``) so every frame is a deterministic row
set; measure sums run in exact decimal (see ``_util``) so accumulation order
can't flip bits.

Scale notes: every window here partitions by a key (user_id / custkey), so
state is distributed across the shuffle — no global-ordering window without a
partition key appears in the hot path (a single-partition window is the
classic 100 TB anti-pattern).  Event-time bucketing (``F.window``,
``session_window``) is the same construct Structured Streaming uses, so the
batch queries in this module promote to the streaming module unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

VAL_DEC = "decimal(18,6)"  # events.value ~ U[0,100); exact to 6dp


# ---------------------------------------------------------------------------
# Ranking (§2.I rank/row-number)
# ---------------------------------------------------------------------------


@query(
    "window_ranking",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_totalprice,
      ROW_NUMBER()  OVER w AS rn,
      RANK()        OVER w AS rnk,
      DENSE_RANK()  OVER w AS drnk,
      NTILE(4)      OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile per customer (groupby.cumcount and
    ranking idioms)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Shift / diff (§2.I lag/lead)
# ---------------------------------------------------------------------------


@query(
    "window_lag_lead",
    oracle="""
    SELECT
      user_id,
      event_id,
      ts,
      LAG(value)  OVER w AS prev_value,
      LEAD(value) OVER w AS next_value,
      CAST(CAST(value AS DECIMAL(18,6)) - CAST(LAG(value) OVER w AS DECIMAL(18,6))
           AS DOUBLE) AS value_diff,
      (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) // 1000 AS ms_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``shift``/``diff`` per user: lag/lead + elapsed time since previous
    event (unique event_id tiebreak keeps the frame deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value").cast(VAL_DEC) - prev_v.cast(VAL_DEC))
        .cast("double")
        .alias("value_diff"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1000
        ).cast("bigint").alias("ms_since_prev"),
    )


# ---------------------------------------------------------------------------
# Cumulative scan (§2.E cumsum family)
# ---------------------------------------------------------------------------


@query(
    "window_cumsum",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_total,
      COUNT(*) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS event_seq
    FROM events
    """,
)
def window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cumsum`` / running count per key (exact decimal accumulation)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(VAL_DEC)).over(w).cast("double").alias("running_total"),
        F.count("*").over(w).alias("event_seq"),
    )


@query(
    "window_cummax",
    oracle="""
    SELECT
      user_id,
      event_id,
      MAX(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS running_max
    FROM events
    """,
)
def window_cummax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cummax`` per key — order-insensitive comparison, exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.max("value").over(w).alias("running_max"),
    )


@query(
    "window_cummin",
    oracle="""
    SELECT
      user_id,
      event_id,
      MIN(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS running_min
    FROM events
    """,
)
def window_cummin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cummin`` per key — order-insensitive comparison, exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.min("value").over(w).alias("running_min"),
    )


@query(
    "window_cumprod",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(exp(SUM(ln(1.0 + l_discount)) OVER (
        PARTITION BY l_orderkey ORDER BY l_linenumber, l_discount
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      )), 6) AS discount_compound
    FROM lineitem
    """,
)
def window_cumprod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cumprod`` per key via :func:`..functions.cumulative_product`
    (sign/zero-aware log-domain running product — Spark has no product
    window aggregate).  Factors ``1 + l_discount`` ∈ [1.0, 1.1] over ≤7
    lines per order, so the log-domain accumulation stays well-conditioned;
    rounded to 6dp to absorb the last transcendental ulp (both engines sum
    the identical ``ln`` terms in the identical frame order).

    Ordering note: (l_orderkey, l_linenumber) is NOT unique in the driver
    testdata, so the frame also orders by ``l_discount`` — rows tying on
    all three keys are interchangeable in output space (identical output
    columns ⇒ the multiset of results is order-invariant), which keeps the
    cross-engine hash deterministic without a synthetic row id."""
    from ..functions import cumulative_product

    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_discount")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            cumulative_product(F.lit(1.0) + F.col("l_discount"), w), 6
        ).alias("discount_compound"),
    )


# ---------------------------------------------------------------------------
# Rolling windows — row-count frame and time-range frame (§2.I rolling)
# ---------------------------------------------------------------------------


@query(
    "window_rolling_rows",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS DOUBLE) AS rolling_avg5,
      MAX(value) OVER w AS rolling_max5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rolling(5).mean/max`` — row-count frame; mean = decimal-sum/count
    so both engines do the identical single IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(F.col("value").cast(VAL_DEC)).over(w).cast("double") / F.count("*").over(w))
        .alias("rolling_avg5"),
        F.max("value").over(w).alias("rolling_max5"),
    )


@query(
    "window_rolling_range_1h",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h,
      COUNT(*) OVER w AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rolling('1h')`` — time-range frame over epoch **microseconds** (both
    engines frame on the same integer axis; whole seconds would silently
    truncate sub-second timestamps)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(VAL_DEC)).over(w).cast("double").alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


# ---------------------------------------------------------------------------
# Resample / event-time buckets (§2.I resample; §2.H batch windows)
# ---------------------------------------------------------------------------


@query(
    "resample_hourly",
    oracle="""
    SELECT
      CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS DOUBLE)
        AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``resample('1h').agg`` → tumbling event-time window.  Uses
    ``F.window`` (not date_trunc) deliberately: the identical construct runs
    under Structured Streaming with a watermark (streaming module)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("sum_value"),
            (F.sum(F.col("value").cast(VAL_DEC)).cast("double") / F.count("value"))
            .alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


@query(
    "sliding_window_30m",
    oracle="""
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL 30 MINUTE, ts),
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
             ]) AS window_start,
             value
      FROM events
    )
    GROUP BY window_start
    """,
)
def sliding_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h window every 30min (each event lands in 2 overlapping
    windows) — streaming-grade construct, checked in batch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "sessionize_10m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 10-minute inactivity gap via
    ``session_window`` (Spark-native; the oracle is the classic
    gaps-and-islands rewrite).  ``session_window.end`` = last event + gap.
    Same construct powers streaming sessionization with watermarks."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Forward-fill (§2.C fillna(method='ffill') — needs a window in Spark)
# ---------------------------------------------------------------------------


@query(
    "window_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           LAST_VALUE(big_val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_val
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN value >= 50 THEN value END AS big_val
      FROM events
    )
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``ffill`` re-expressed: last non-null over an ordered frame
    (values <50 masked to NULL, then forward-filled per user)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    big = F.when(F.col("value") >= 50, F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.last(big, ignorenulls=True).over(w).alias("filled_val"),
    )


@query(
    "rollup_cascade_daily",
    oracle="""
    SELECT
      CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      MIN(value) AS min_value,
      MAX(value) AS max_value,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: daily answers computed FROM the
    hourly materialization (never re-scanning raw events) — the oracle is
    the direct daily aggregation, so the hash-match proves algebraic
    reaggregation is exact (decimal partials compose bit-for-bit)."""
    from ..operators.rollup_cascade import reaggregate, rollup_hourly

    ev = load_table(spark, sf_dir, "events")
    hourly = rollup_hourly(ev)
    # approx_users (HLL cascade) is pytest-pinned instead: DuckDB's approx
    # sketch differs, so it can't be part of the hash-matched output
    return reaggregate(hourly, "1 day").drop("approx_users")


@query("rollup_cascade_daily_hll", oracle=None)
def rollup_cascade_daily_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-mergeable distinct through the rollup cascade (VERDICT r3 item
    8): daily ``approx_users`` computed by UNIONING the hourly HLL
    sketches — never re-scanning raw events — exactly how a hypertable
    continuous aggregate answers COUNT(DISTINCT) at every resolution.
    Rows-only: Spark's datasketches HLL and DuckDB's approx sketch differ,
    so there is no hash twin; ``tests/test_relational.py``
    (test_hll_cascade_equals_direct_sketch) pins the cascade estimate
    identical to a direct daily sketch (same merged registers) AND within
    5% of exact countDistinct.

    Scale shape: hourly partials carry fixed-size (2^12-register) sketch
    binaries, so the daily reaggregation shuffles |hours|×|event_type|
    rows of ~KB sketches — constant per bucket regardless of raw event
    volume."""
    from ..operators.rollup_cascade import reaggregate, rollup_hourly

    ev = load_table(spark, sf_dir, "events")
    daily = reaggregate(rollup_hourly(ev), "1 day")
    return daily.select(
        "bucket_start",
        "event_type",
        "n_events",
        F.col("approx_users").cast("bigint").alias("approx_users"),
    ).orderBy("bucket_start", "event_type")


@query(
    "window_rank_fractions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST()    OVER w, 6) AS cume,
           NTILE(10)            OVER w AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional ranking (percent_rank / cume_dist / ntile deciles) —
    completes the ranking-window family beyond row_number/rank."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


# ---------------------------------------------------------------------------
# Event-funnel analysis (§2.H user-journey analytics)
# ---------------------------------------------------------------------------


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.view_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CASE WHEN p.purchase_ts IS NOT NULL THEN 'purchase'
                WHEN c.click_ts IS NOT NULL THEN 'click'
                ELSE 'view' END AS reached
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user view→click→purchase funnel: earliest view, earliest click
    at-or-after it, earliest purchase at-or-after that.

    The oracle states the semantics as three grouped self-joins (three
    shuffles of events).  The Spark plan instead chains three conditional-
    min windows over ``user_id`` — each stage references the previous
    stage's window result, and every window (and the final dedup) reuses
    the SAME hash partitioning, so the whole funnel is ONE exchange of the
    events table regardless of funnel depth.  That is the shape that
    survives 100 TB: funnel stages cost projections, not shuffles."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "click_ts",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("view_ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "purchase_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("click_ts")),
                F.col("ts"),
            )
        ).over(w),
    )
    return (
        s3.filter(F.col("view_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("view_ts").alias("view_ts"),
            F.min("click_ts").alias("click_ts"),
            F.min("purchase_ts").alias("purchase_ts"),
        )
        .withColumn(
            "reached",
            F.when(F.col("purchase_ts").isNotNull(), "purchase")
            .when(F.col("click_ts").isNotNull(), "click")
            .otherwise("view"),
        )
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           round(median(CAST(value AS DOUBLE)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS roll_med
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over a 20-row trailing frame (pandas
    ``rolling(20).median()`` — the robust smoother that shrugs off the
    spikes an EWMA chases).  Spark has no native windowed median, so the
    frame's value list is collected and the percentile_cont(0.5) formula
    applied explicitly: odd n → middle element, even n → mean of the two
    middles — the identical selection-then-one-IEEE-op DuckDB's windowed
    ``median`` performs, so no rounding slack is needed (6 decimals kept
    for hash normalization only).

    Scale shape: the same single user_id window exchange as every rolling
    query; per-row state is the O(frame) sorted array."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-19, 0)
    )
    vals = F.array_sort(F.collect_list(F.col("value").cast("double")).over(w))
    n = F.size(vals)
    mid_hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid_lo).otherwise((mid_lo + mid_hi) / F.lit(2.0))
    return ev.select(
        "user_id", "event_id", F.round(med, 6).alias("roll_med")
    )
