"""Structured Streaming surface (SURVEY.md §2.H streaming row).

The batch window queries (``resample_hourly``, ``sliding_window_30m``,
``sessionize_10m`` in ``queries/windows.py``) use ``F.window`` /
``session_window`` — the exact constructs Structured Streaming executes, so
promotion is: ``readStream`` source + ``withWatermark`` + the same
transformation + ``writeStream``.  This module packages that promotion.

Production notes (100 TB): use ``append`` output with a watermark so state
is bounded and emitted windows are final; ``complete`` mode below exists
only for the oracle-checked demo (it retains all windows in state — fine
for a bounded demo, unbounded memory on a real stream).  State store scale
is governed by keys × open windows; session windows additionally merge —
keep gaps tight.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VAL_DEC = "decimal(18,6)"


def _staged_events_dir(sf_dir: str) -> str:
    """The streaming file source requires a *directory*; the testdata is a
    single file.  Stage a per-sf directory of symlinks under /tmp."""
    import hashlib
    import os

    sf_dir = os.path.abspath(sf_dir)  # a relative target would dangle
    d = f"/tmp/spark_graft_stream_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if os.path.islink(link) and not os.path.exists(link):
        os.unlink(link)  # dangling link from a deleted source
    if not os.path.islink(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (same ``ts`` normalization
    as the batch loader: nanos-as-long generations convert with exact
    integer division, NTZ generations reinterpret under the UTC session
    zone)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from ..sources import load_table

    schema = load_table(spark, sf_dir, "events").schema  # post-conversion schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    df = (
        spark.readStream.schema(raw_schema)
        .parquet(_staged_events_dir(sf_dir))
    )
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    assert df.schema == schema
    return df


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling event-time aggregation (streaming twin of the
    batch ``resample_hourly`` query)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ohlc_bars(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling OHLC bars (streaming twin of the batch
    ``resample_hourly_ohlc`` query): first/last value by event time via
    ``min_by``/``max_by`` inside the windowed aggregate — per-window
    state is one (value, ts) pair per extreme, O(1)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("hr"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def sessionized(stream: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    """Watermarked session-window aggregation (streaming twin of batch
    ``sessionize_10m``)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
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


def dedup_within_watermark(stream: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup with bounded state (late duplicates beyond the
    watermark may pass — the documented tradeoff vs unbounded exact)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: match right events to left events of the
    same key that occur within ``[left_ts, left_ts + within]``.

    Both sides carry watermarks + the time-range predicate, which is what
    lets Spark bound the join state (rows older than watermark+range are
    evicted) — without both, a stream-stream join's state grows forever.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic unbounded source (``rate`` format): (timestamp, value) —
    the standard demo/load-test source; swap for kafka/file in production."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def foreach_batch_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """``foreachBatch`` sink: micro-batch → idempotent parquet write.
    The escape hatch for sinks Structured Streaming lacks natively (JDBC,
    upserts): the function receives a BATCH DataFrame + epoch id, so any
    batch writer works.  Exactly-once = checkpoint (skip committed
    epochs on restart) + idempotent per-epoch writes: each epoch lands in
    its own partition with dynamic partition overwrite, so a *retried*
    epoch replaces its partial output instead of appending duplicates."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("__epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_completion(
    stream_df: DataFrame,
    output_mode: str = "complete",
    table_prefix: str = "stream_out",
    max_rows: int = 10_000_000,
) -> DataFrame:
    """Execute a finite stream with availableNow into a memory sink and
    return the materialized result as a batch DataFrame.

    **Validation/demo/oracle path only**: the memory sink materializes the
    ENTIRE result in driver memory.  ``max_rows`` (default 10M) is the
    guard rail — if the finished result exceeds it, the sink table is
    dropped and ``ValueError`` raised instead of silently holding an
    unbounded result on the driver.  For anything larger, use the
    production sinks: ``foreach_batch_parquet`` (idempotent per-epoch
    parquet, exactly-once under retry) or a plain append-mode
    ``writeStream`` — both keep results executor-side (see module
    docstring)."""
    name = f"{table_prefix}_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    spark = stream_df.sparkSession
    n = spark.table(name).count()
    if n > max_rows:
        spark.catalog.dropTempView(name)
        raise ValueError(
            f"run_to_completion result has {n} rows > max_rows={max_rows}; "
            "this memory-sink path is for validation-scale runs only — use "
            "foreach_batch_parquet / an append-mode writeStream sink for "
            "large results (or raise max_rows deliberately)"
        )
    # detach from the memory sink (checkpointed copy) and drop the sink
    # table — otherwise every call leaks its full result set in driver
    # memory for the session lifetime
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def static_enriched_counts(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join + windowed rollup: enrich each event with a
    slowly-changing dimension (a BATCH DataFrame — re-read per
    micro-batch by Structured Streaming, so dim updates between batches
    are picked up) and aggregate per (window, dim attribute).

    The stream-static join is stateless — no watermark interaction, no
    join state: each micro-batch joins against the current dim snapshot.
    Only the windowed aggregation that follows keeps (bounded,
    watermark-expired) state.  At 100 TB the dim side is the usual join
    sizing question: broadcast if small, else a shuffle join per
    micro-batch."""
    joined = stream.withWatermark("ts", watermark).join(dim, key)
    return (
        joined.groupBy(F.window("ts", window).alias("w"), "tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "tier", "n_events", "sum_value")
    )


def binned_window_counts(
    stream: DataFrame,
    bin_width: float = 50.0,
    n_bins: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(bucket_start, bin, c): watermarked windowed histogram of the
    ``value`` column on a fixed bin grid — the streaming substrate of a
    drift monitor (PSI/KS against a baseline histogram is a cheap batch
    computation over these bounded summaries; see ``stream_psi_drift``).
    State is one count per (open window, bin) — bins are a constant, so
    state is watermark-bounded exactly like ``tumbling_counts``."""
    binned = stream.withWatermark("ts", watermark).withColumn(
        "bin",
        # clamp BOTH ends: without the lower clamp a negative value mints
        # unbounded negative bin ids, breaking the bins-are-a-constant
        # state bound this docstring promises
        F.greatest(
            F.least(
                F.floor(F.col("value") / bin_width).cast("bigint"),
                F.lit(n_bins - 1),
            ),
            F.lit(0).cast("bigint"),
        ),
    )
    return (
        binned.groupBy(F.window("ts", window).alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("bucket_start"), "bin", "c")
    )
