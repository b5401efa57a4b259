"""Deterministic first/last aggregates (SURVEY.md §2.E first/last row).

Spark's ``first``/``last`` in groupBy.agg are order-undefined (they pick
whatever partition order delivers) — useless for reproducible pipelines.
The deterministic form is ``min_by``/``max_by`` on an explicit ordering
column (DuckDB: ``arg_min``/``arg_max``), which is what this engine
exposes as the first/last surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "agg_first_last_by_time",
    oracle="""
    SELECT user_id,
           arg_min(event_type, ts) AS first_event_type,
           arg_max(event_type, ts) AS last_event_type,
           arg_min(value, ts)      AS first_value,
           arg_max(value, ts)      AS last_value,
           CAST(min(ts) AS TIMESTAMP) AS first_ts,
           CAST(max(ts) AS TIMESTAMP) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def agg_first_last_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user by event time — ``min_by``/``max_by``
    (deterministic because ``(user_id, ts)`` is unique in the testdata)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_event_type"),
        F.max_by("event_type", "ts").alias("last_event_type"),
        F.min_by("value", "ts").alias("first_value"),
        F.max_by("value", "ts").alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (each user's most frequent event type,
    ties broken alphabetically — pandas ``groupby().agg(pd.Series.mode)``
    determinized).  One (user,type) partial-agg'd shuffle + a rank window
    reusing the user partitioning: Catalyst plans the count and the
    row_number over the SAME exchange."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )
