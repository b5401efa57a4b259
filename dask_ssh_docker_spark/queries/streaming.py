"""Streaming queries (SURVEY.md §2.H): a real Structured Streaming
execution (file source → watermark → windowed agg → availableNow → memory
sink) whose materialized result is oracle-checked against the same batch
SQL — proving the batch/streaming twins produce identical answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import run_to_completion, sessionized, stream_events, tumbling_counts
from .registry import query


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT
      CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes an actual streaming job (complete mode, availableNow) —
    result must equal the batch hourly rollup bit-for-bit."""
    return run_to_completion(tumbling_counts(stream_events(spark, sf_dir)))


@query("stream_sessionize", oracle=None)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (complete mode unsupported for session
    windows + append drops un-finalized sessions → rows-only check; batch
    twin ``sessionize_10m`` carries the full oracle)."""
    return run_to_completion(
        sessionized(stream_events(spark, sf_dir)), output_mode="append"
    )
