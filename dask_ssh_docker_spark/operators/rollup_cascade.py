"""Multi-resolution rollup cascade — the hypertable/continuous-aggregate
pattern (SURVEY.md §2.H streaming row adjacency; TimescaleDB-style
"hypertable rollup" named in the build brief).

At 100 TB you never re-scan raw events to answer a daily question: you
maintain an hourly materialization and reaggregate it.  That only works
for **algebraic** aggregates — (count, sum, min, max) compose; avg is
derived at read time as sum/count; exact distinct does NOT compose (use
HLL sketches for that).  This operator builds the cascade and the tests +
oracle prove reaggregation equals direct aggregation bit-for-bit (sums in
exact decimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VAL_DEC = "decimal(18,6)"

#: algebraic partials carried at every resolution
_PARTIALS = ("n_events", "sum_value", "min_value", "max_value", "users_hll")


def rollup_hourly(events: DataFrame, keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Raw events → hourly partials (the base materialization)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            # distinct does NOT compose exactly — carry an HLL sketch
            # (datasketches binary; order-insensitive, mergeable)
            F.hll_sketch_agg("user_id").alias("users_hll"),
        )
        .select(F.col("w.start").alias("bucket_start"), *keys, *_PARTIALS)
    )


def reaggregate(
    finer: DataFrame,
    bucket: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
    final: bool = True,
) -> DataFrame:
    """Finer-resolution partials → coarser buckets WITHOUT touching raw
    data: counts/sums add, min/max combine, HLL sketches union.

    ``final=False`` keeps the partial schema (decimal sums, raw sketches)
    so cascades compose to any depth —
    ``reaggregate(reaggregate(hourly, '1 day', final=False), '1 month')``.
    ``final=True`` derives the read-time outputs (double sums, avg,
    sketch estimate)."""
    agg = (
        finer.groupBy(F.window("bucket_start", bucket).alias("w"), *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.hll_union_agg("users_hll").alias("users_hll"),
        )
    )
    if not final:
        return agg.select(F.col("w.start").alias("bucket_start"), *keys, *_PARTIALS)
    return agg.select(
        F.col("w.start").alias("bucket_start"),
        *keys,
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
        F.hll_sketch_estimate("users_hll").alias("approx_users"),
    )
