"""Feature-engineering primitives (SURVEY.md §2.H extension): the
encode/featurize steps that sit between curated tables and model
training — leave-one-out target encoding, the signed hashing trick,
half-life-decayed activity features, and Brown's double exponential
smoothing (level + trend forecast).

Determinism doctrine (``_util.py``): hash-based features use md5 (bitwise
identical across engines, re-partitioning, and re-runs — never
``rand()``); measure accumulation is exact integer/decimal; decay weights
are exact powers of two accumulated as scaled integers, so even the
"floating-point" decayed sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "target_encode_loo",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN cnt > 1
                THEN CAST(s - y AS DOUBLE) / CAST(cnt - 1 AS DOUBLE)
           END AS loo_enc
    FROM (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(12,2)) AS y,
             SUM(CAST(o_totalprice AS DECIMAL(12,2)))
               OVER (PARTITION BY o_orderpriority) AS s,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      FROM orders
    )
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of ``o_orderpriority`` against
    ``o_totalprice``: each row's encoding is the mean target of its
    category *excluding itself* — ``(Σ_cat y − y_i)/(n_cat − 1)`` — the
    standard leakage-safe categorical encoder for gradient-boosted /
    linear models (plain mean encoding leaks the row's own label).
    Singleton categories encode NULL (no leave-one-out mean exists).

    Determinism: the category sum and the subtraction are exact DECIMAL;
    one IEEE division per row, emitted UNROUNDED — the operands convert
    correctly-rounded in both engines (the numerator stays under 2^53
    scaled units), so the quotient double is bit-identical and display
    rounding would only ADD divergence risk (`round(x, 6)` at 1e5+
    magnitudes is implemented differently per engine and can flip the
    last digit; measured at sf1).

    Scale: a single whole-partition window keyed on the category — one
    shuffle, no join; skewed categories follow the salted-window recipe
    in SCALE.md."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(12,2)")
    w = Window.partitionBy("o_orderpriority")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        y.alias("y"),
        F.sum(y).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.col("cnt") > 1,
            (F.col("s") - F.col("y")).cast("double")
            / (F.col("cnt") - 1).cast("double"),
        ).alias("loo_enc"),
    )


_FH_BUCKETS = 32


@query(
    "feature_hash_signed",
    oracle=f"""
    WITH f AS (
      SELECT 'pri=' || o_orderpriority AS feat FROM orders
      UNION ALL
      SELECT 'st=' || o_orderstatus FROM orders
    ),
    h AS (
      SELECT CAST(('0x' || substr(md5(feat), 1, 4)) AS BIGINT)
               % {_FH_BUCKETS} AS bucket,
             CASE WHEN substr(md5(feat), 5, 1) < '8' THEN 1 ELSE -1 END
               AS sgn
      FROM f
    )
    SELECT bucket,
           CAST(SUM(sgn) AS BIGINT) AS weight_sum,
           COUNT(*) AS n_feats
    FROM h GROUP BY bucket
    """,
)
def feature_hash_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing trick (Weinberger et al.'s feature hashing) over
    two categorical columns: each feature string hashes to one of
    32 buckets via an md5 prefix, with a second hash bit
    choosing ±1 so collisions cancel in expectation — the fixed-width,
    vocabulary-free encoding for unbounded categorical domains.  Output
    is the corpus-level bucket profile (signed mass + load per bucket).

    Determinism: md5 is bitwise identical across engines; bucket and
    sign are pure integer/string ops; sums are integers.

    Scale: map-side hash + groupBy onto 32 buckets — the
    shuffle carries only the bucket summary.  Per-row feature *vectors*
    (the training-side form) are the same expressions kept un-aggregated."""
    orders = load_table(spark, sf_dir, "orders")
    feats = orders.select(
        F.explode(
            F.array(
                F.concat(F.lit("pri="), F.col("o_orderpriority")),
                F.concat(F.lit("st="), F.col("o_orderstatus")),
            )
        ).alias("feat")
    )
    h = F.md5(F.col("feat"))
    hashed = feats.select(
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % _FH_BUCKETS)
        .alias("bucket"),
        F.when(F.substring(h, 5, 1) < "8", 1).otherwise(-1).alias("sgn"),
    )
    return hashed.groupBy("bucket").agg(
        F.sum("sgn").cast("bigint").alias("weight_sum"),
        F.count(F.lit(1)).alias("n_feats"),
    )


# Half-life decay: weight 2^-d for an event d days before the anchor,
# capped at 24 days (2^-24 ≈ 6e-8 — older events contribute the floor
# weight).  Weights are accumulated as integer multiples of 2^-24, so the
# "floating-point" decayed sums are exact integer arithmetic until one
# final division.
_DECAY_ANCHOR = "2024-01-31"
_DECAY_CAP = 24
_DECAY_SCALE = float(1 << _DECAY_CAP)


@query(
    "decayed_user_activity",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             GREATEST(LEAST(datediff('day', CAST(ts AS DATE),
                                     DATE '{_DECAY_ANCHOR}'),
                            {_DECAY_CAP}), 0) AS d,
             CAST(CAST(value AS DECIMAL(8,2)) * 100 AS BIGINT) AS v_cents
      FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(power(2, {_DECAY_CAP} - d) AS BIGINT) AS wn,
             v_cents
      FROM s
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           round(CAST(SUM(wn) AS DOUBLE) / {_DECAY_SCALE!r}, 6)
             AS decayed_count,
           round(CAST(SUM(v_cents * wn) AS DOUBLE) / 100.0
                   / {_DECAY_SCALE!r}, 6) AS decayed_value
    FROM w GROUP BY user_id
    """,
)
def decayed_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed per-user activity features as of a fixed anchor
    date: each event weighs ``2^-days_ago`` (1-day half-life, capped at
    24 days), yielding a freshness-weighted event count and spend —
    the standard recency feature for churn/engagement models, computable
    in one pass instead of N windowed aggregates.

    Determinism: weights are exact powers of two accumulated as integer
    multiples of ``2^-24`` (the value sum stays in integer cents), so
    the sums are order-independent bigints; two IEEE divisions at the
    end.

    Scale: pure map-side weighting + one groupBy per user — identical
    shuffle shape to a plain per-user count."""
    ev = load_table(spark, sf_dir, "events")
    d = F.greatest(
        F.least(
            F.datediff(
                F.lit(_DECAY_ANCHOR).cast("date"), F.col("ts").cast("date")
            ),
            F.lit(_DECAY_CAP),
        ),
        F.lit(0),
    )
    s = ev.select(
        "user_id",
        d.alias("d"),
        (F.col("value").cast("decimal(8,2)") * 100)
        .cast("bigint")
        .alias("v_cents"),
    )
    w = s.select(
        "user_id",
        F.pow(F.lit(2), F.lit(_DECAY_CAP) - F.col("d"))
        .cast("bigint")
        .alias("wn"),
        "v_cents",
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("wn").cast("double") / _DECAY_SCALE, 6).alias(
            "decayed_count"
        ),
        F.round(
            F.sum(F.col("v_cents") * F.col("wn")).cast("double")
            / 100.0
            / _DECAY_SCALE,
            6,
        ).alias("decayed_value"),
    )


# Brown's double exponential smoothing over a bounded trailing frame
# (streaming-safe: O(frame) state).  Same truncated-adjusted fold as
# window_ewma_bounded; repr-interpolated constants keep both engines on
# bitwise-identical divisors (1-0.7 is not 0.3 in IEEE).
_H_DECAY = 0.7
_H_ONE_MINUS = 1 - _H_DECAY
_H_ALPHA_RATIO = (1 - _H_DECAY) / _H_DECAY  # α/(1−α) with α = 1−decay
_H_FRAME = 14


@query(
    "holt_brown_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(8,2))) AS DOUBLE) AS y
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    v1 AS (
      SELECT user_id, day,
             list(y) OVER (PARTITION BY user_id ORDER BY day
                           ROWS BETWEEN {_H_FRAME - 1} PRECEDING
                             AND CURRENT ROW) AS vals
      FROM daily
    ),
    e1 AS (
      SELECT user_id, day,
             list_reduce(vals, (acc, x) -> acc * {_H_DECAY} + x)
               / ((1 - power({_H_DECAY}, len(vals))) / {_H_ONE_MINUS!r})
               AS s1
      FROM v1
    ),
    v2 AS (
      SELECT user_id, day, s1,
             list(s1) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN {_H_FRAME - 1} PRECEDING
                              AND CURRENT ROW) AS vals1
      FROM e1
    ),
    e2 AS (
      SELECT user_id, day, s1,
             list_reduce(vals1, (acc, x) -> acc * {_H_DECAY} + x)
               / ((1 - power({_H_DECAY}, len(vals1))) / {_H_ONE_MINUS!r})
               AS s2
      FROM v2
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           round(2 * s1 - s2, 6) AS level_smooth,
           round({_H_ALPHA_RATIO!r} * (s1 - s2), 6) AS trend_smooth,
           round((2 * s1 - s2) + {_H_ALPHA_RATIO!r} * (s1 - s2), 6)
             AS forecast_next
    FROM e2
    """,
)
def holt_brown_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing of each user's daily spend:
    s1 = EWMA(y), s2 = EWMA(s1) (both the truncated-adjusted fold over a
    14-day trailing frame, as in ``window_ewma_bounded``), then the
    classic level/trend decomposition ``level = 2·s1 − s2``,
    ``trend = (α/(1−α))·(s1 − s2)`` and the one-step-ahead forecast
    ``level + trend`` — trend-aware smoothing with O(frame) state, the
    streaming-safe form of Holt's method.

    Determinism: daily totals are exact-decimal sums; both smoothing
    passes are left folds over frame-ordered lists (identical IEEE op
    sequence in Spark's ``aggregate`` and DuckDB's ``list_reduce``);
    constants are repr-interpolated so divisors match bitwise.

    Scale: one shuffle to daily grain, then two windows over the same
    per-user ordering — a single exchange; state bounded by the frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(8,2)")).cast("double").alias("y"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-(_H_FRAME - 1), 0)
    )

    def _ewma(list_col: F.Column) -> F.Column:
        num = F.aggregate(
            list_col, F.lit(0.0), lambda acc, x: acc * F.lit(_H_DECAY) + x
        )
        den = (
            F.lit(1.0) - F.pow(F.lit(_H_DECAY), F.size(list_col))
        ) / F.lit(_H_ONE_MINUS)
        return num / den

    e1 = daily.select(
        "user_id", "day", _ewma(F.collect_list("y").over(w)).alias("s1")
    )
    e2 = e1.select(
        "user_id",
        "day",
        "s1",
        _ewma(F.collect_list("s1").over(w)).alias("s2"),
    )
    level = 2 * F.col("s1") - F.col("s2")
    trend = F.lit(_H_ALPHA_RATIO) * (F.col("s1") - F.col("s2"))
    return e2.select(
        "user_id",
        # timestamp at the boundary: DateType is banned from driver-visible
        # output (tests/test_schema_policy.py)
        F.col("day").cast("timestamp").alias("day"),
        F.round(level, 6).alias("level_smooth"),
        F.round(trend, 6).alias("trend_smooth"),
        F.round(level + trend, 6).alias("forecast_next"),
    )
