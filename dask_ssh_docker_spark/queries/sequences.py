"""Event-sequence mining (SURVEY.md §2.H extension): the clickstream /
behavioral analytics a product pipeline runs over the ordered per-user
event log — Markov transition matrices, path n-grams, and last-touch
revenue attribution.

All of these are ONE window exchange partitioned by ``user_id`` (the
natural key: every sequence computation is user-local), followed by a
small grouped aggregation — the canonical scale shape for sequence
analytics: state per user is bounded, no global order is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import sql_dsum
from .registry import query

# Deterministic per-user event order: timestamp, tie-broken on event_id.
_ORDER_SQL = "epoch_us(ts), event_id"


@query(
    "markov_event_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY {_ORDER_SQL}) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
    FROM c
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for each
    ordered pair of consecutive event types within a user's timeline,
    the transition count and conditional probability
    ``P(to | from) = n(from,to) / n(from,·)``.  The behavioral-model
    baseline (what follows a 'view'?).  Counts are exact integers; each
    probability is one integer÷integer double division — identical in
    both engines.

    Scale: one user_id window exchange for the LEAD, aggregate to
    |types|² rows, then a window marginal over that tiny frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    marg = F.sum("n").over(Window.partitionBy("from_type"))
    return c.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / marg.cast("double")).alias("prob"),
    )


@query(
    "event_trigram_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY {_ORDER_SQL}) AS e2,
             LEAD(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY {_ORDER_SQL}) AS e3
      FROM events
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 15
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most frequent 3-event paths (sequence trigrams) across user
    timelines — the funnel-discovery primitive ("what do users actually
    do?").  Two LEADs over the same user window (one exchange, one sort),
    exact counts, top-k tie-broken on the path string.

    Scale: the trigram space is |types|³ (125 here) — the grouped frame
    is tiny no matter the event volume; top-k is TakeOrderedAndProject,
    never a global sort of the fact table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    return paths.orderBy(F.col("n").desc(), "path").limit(15)


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH tagged AS (
      SELECT ts, event_id, value, event_type,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY {_ORDER_SQL}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           {sql_dsum("value", "DECIMAL(18,6)")} AS attributed_value
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase is credited to the
    user's most recent preceding touchpoint ('view' or 'click'; 'direct'
    if none) — the standard marketing-attribution readout.  The carry is
    ``last_value(..., ignoreNulls) ROWS UNBOUNDED PRECEDING..1 PRECEDING``
    over the user timeline: the same streaming-friendly forward-fill
    shape as window_forward_fill, so no self-join against the touch
    subset is needed.  Purchase values aggregate in exact DECIMAL.

    Scale: one user_id window exchange, then aggregate to |channels|
    rows.  (An asof-join formulation of the same query shuffles BOTH a
    purchases and a touches table; the single-pass carry reads the log
    once.)"""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_src = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    tagged = ev.select(
        "event_type",
        "value",
        F.last(touch_src, ignorenulls=True).over(w).alias("touch"),
    ).filter(F.col("event_type") == "purchase")
    return tagged.groupBy(
        F.coalesce("touch", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("attributed_value"),
    )
