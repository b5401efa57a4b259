"""As-of join queries (SURVEY.md §2.D merge_asof — flagship custom op).

Checked against DuckDB's native ``ASOF JOIN`` on the ``events`` table
(per-user event streams; ``(user_id, ts)`` is unique in the testdata, so
the oracle's choice of match is deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import merge_asof
from ..sources import load_table
from .registry import query


def _events(spark, sf_dir, etype):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == etype)
        .select("user_id", "ts", "event_id", "value")
    )


@query(
    "asof_backward",
    oracle="""
    SELECT l.user_id, l.ts, l.event_id, l.value,
           r.ts AS ts_right, r.event_id AS event_id_right, r.value AS value_right
    FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'view' event: the latest 'click' by the same user at or
    before it (classic attribution join)."""
    views = _events(spark, sf_dir, "view")
    clicks = _events(spark, sf_dir, "click")
    return merge_asof(
        views, clicks, on="ts", by="user_id", direction="backward",
        tiebreak="event_id",
    )


@query(
    "asof_backward_tolerance",
    oracle="""
    SELECT l.user_id, l.ts, l.event_id, l.value,
           CASE WHEN l.ts - r.ts <= INTERVAL 30 MINUTE THEN r.ts END
             AS ts_right,
           CASE WHEN l.ts - r.ts <= INTERVAL 30 MINUTE THEN r.event_id END
             AS event_id_right,
           CASE WHEN l.ts - r.ts <= INTERVAL 30 MINUTE THEN r.value END
             AS value_right
    FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_backward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 30-minute tolerance — stale matches null out."""
    views = _events(spark, sf_dir, "view")
    clicks = _events(spark, sf_dir, "click")
    return merge_asof(
        views, clicks, on="ts", by="user_id", direction="backward",
        tolerance=F.expr("INTERVAL 30 MINUTES"), tiebreak="event_id",
    )


@query(
    "asof_forward",
    oracle="""
    SELECT l.user_id, l.ts, l.event_id, l.value,
           r.ts AS ts_right, r.event_id AS event_id_right, r.value AS value_right
    FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN
         (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'click': the next 'purchase' by the same user (conversion
    lookahead)."""
    clicks = _events(spark, sf_dir, "click")
    purchases = _events(spark, sf_dir, "purchase")
    return merge_asof(
        clicks, purchases, on="ts", by="user_id", direction="forward",
        tiebreak="event_id",
    )


@query(
    "asof_nearest",
    oracle="""
    WITH l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error'),
         r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'signup'),
    b AS (
      SELECT l.event_id, r.ts AS rts, r.event_id AS rid, r.value AS rval
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    f AS (
      SELECT l.event_id, r.ts AS rts, r.event_id AS rid, r.value AS rval
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT l.user_id, l.ts, l.event_id, l.value,
      CASE WHEN b.rts IS NULL THEN f.rts
           WHEN f.rts IS NULL THEN b.rts
           WHEN epoch_us(f.rts) - epoch_us(l.ts) < epoch_us(l.ts) - epoch_us(b.rts)
             THEN f.rts ELSE b.rts END AS ts_right,
      CASE WHEN b.rts IS NULL THEN f.rid
           WHEN f.rts IS NULL THEN b.rid
           WHEN epoch_us(f.rts) - epoch_us(l.ts) < epoch_us(l.ts) - epoch_us(b.rts)
             THEN f.rid ELSE b.rid END AS event_id_right,
      CASE WHEN b.rts IS NULL THEN f.rval
           WHEN f.rts IS NULL THEN b.rval
           WHEN epoch_us(f.rts) - epoch_us(l.ts) < epoch_us(l.ts) - epoch_us(b.rts)
             THEN f.rval ELSE b.rval END AS value_right
    FROM l LEFT JOIN b ON l.event_id = b.event_id
           LEFT JOIN f ON l.event_id = f.event_id
    """,
)
def asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest 'signup' to each 'error' in either direction (equidistant →
    backward, pandas semantics)."""
    errors = _events(spark, sf_dir, "error")
    signups = _events(spark, sf_dir, "signup")
    return merge_asof(
        errors, signups, on="ts", by="user_id", direction="nearest",
        tiebreak="event_id",
    )
