"""Time-series linear interpolation (pandas/Dask ``interpolate(method=
'time')`` family — SURVEY.md §2.I adjacency).

Nulls are filled per key by linear interpolation between the nearest
non-null neighbors in event time; leading/trailing gaps fall back to
bfill/ffill.  Two ordered windows over one key shuffle — same cost shape
as the as-of join, no candidate pairs, scales with the partition count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.seqbucket import null_safe_join


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: str | None = None,
    out_col: str | None = None,
    bucket_width_s: int | float | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``<value>_interp``): linear interpolation
    of nulls in ``value_col`` over numeric-time order within ``by`` groups.

    ``bucket_width_s`` (r12, SCALE.md class-7 mitigation): time-range
    sub-bucketing for hot ``by`` keys — the two per-key ordered windows
    become per-(key, time-bucket) windows, and the nearest-known
    neighbors across bucket boundaries are restored exactly via
    per-bucket ``max_by``/``min_by`` (t, value) aggregates cascaded over
    the bounded per-key bucket spine.  The interpolation arithmetic then
    runs on the SAME endpoint pair the global window would have found,
    so the output is bit-identical for any width
    (``tests/test_seqbucket.py``)."""
    out_col = out_col or f"{value_col}_interp"
    by_cols = [by] if by else []
    t = F.unix_micros(F.col(ts_col)).cast("double")
    v = F.col(value_col)

    if bucket_width_s is not None:
        d = df.withColumn("__bkt", F.floor(t / F.lit(bucket_width_s * 1e6)))
        part = Window.partitionBy(*by_cols, "__bkt")
        known = F.when(v.isNotNull(), F.struct(t.alias("t"), v.alias("v")))
        # ordering key: non-null whenever v is non-null — a bare
        # when(v_nn, t) key is NULL for every row of the NULL-ts bucket
        # (t itself is NULL there), so max_by/min_by would IGNORE those
        # known values while the global window keeps them (NULL ts sorts
        # first in asc t); the (t IS NOT NULL, t) struct keeps them
        # orderable, nulls-first, matching the window (ADVICE r12
        # null-handling parity).
        key = F.when(v.isNotNull(), F.struct(t.isNotNull().alias("nn"), t.alias("t")))
        kb = d.groupBy(*by_cols, "__bkt").agg(
            F.max_by(known, key).alias("__lastk"),
            F.min_by(known, key).alias("__firstk"),
        )
        wprev = (
            Window.partitionBy(*by_cols)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # strictly-after cascade as a DESC running frame (see the O(n²)
        # note below — same form for the spine, cheap but consistent)
        wnext = (
            Window.partitionBy(*by_cols)
            .orderBy(F.desc("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = kb.select(
            *by_cols,
            "__bkt",
            F.last("__lastk", ignorenulls=True).over(wprev).alias("__cprev"),
            F.last("__firstk", ignorenulls=True).over(wnext).alias("__cnext"),
        )
        # NULL-SAFE: NULL `by` keys / NULL ts (NULL __bkt) are rows the
        # unbucketed window keeps — a plain equi-join drops them
        # (ADVICE r12, same fix as operators/asof.py's carry join)
        d = null_safe_join(d, carries, [*by_cols, "__bkt"])
    else:
        d = df
        part = Window.partitionBy(by) if by else Window.partitionBy()

    # BOTH neighbor scans are RUNNING frames (unboundedPreceding →
    # currentRow): the next-known side runs over DESCENDING t, where
    # "last non-null so far" IS the next known value in ascending time —
    # the same trick operators/asof.py's forward fill uses.  The naive
    # (currentRow → unboundedFollowing) frame is NOT incremental in
    # Spark: UnboundedFollowingWindowFunctionFrame re-scans current→end
    # for EVERY row — O(n²) per partition, measured as a multi-minute
    # single-task straggler on a 400k-row hot key (skew_probe claim 4,
    # r12); the running form is O(n).
    w_prev = part.orderBy(t).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = part.orderBy(F.desc(t)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.last(v, ignorenulls=True).over(w_next)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)
    if bucket_width_s is not None:
        # a bucket with no earlier/later known value falls back to the
        # carried (t, v) pair — copies of the values the global window
        # would have used, so the arithmetic below is unchanged
        prev_v = F.coalesce(prev_v, F.col("__cprev")["v"])
        prev_t = F.coalesce(prev_t, F.col("__cprev")["t"])
        next_v = F.coalesce(next_v, F.col("__cnext")["v"])
        next_t = F.coalesce(next_t, F.col("__cnext")["t"])

    frac: Column = (t - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)   # leading gap → bfill
        .when(next_v.isNull(), prev_v)   # trailing gap → ffill
        .when(next_t == prev_t, prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    out = d.withColumn(out_col, interp)
    if bucket_width_s is not None:
        # the carry join moved the (by, __bkt) keys to the front —
        # restore the caller's column order (+ out_col last, as in the
        # unbucketed path).  out_col may REPLACE an existing column
        # (e.g. out_col=value_col): withColumn swapped it in place, so
        # exclude it from the passthrough list or the select would emit
        # the name twice (ADVICE r12).
        out = out.select(*[c for c in df.columns if c != out_col], out_col)
    return out
