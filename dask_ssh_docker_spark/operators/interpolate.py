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


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` (default ``<value>_interp``): linear interpolation
    of nulls in ``value_col`` over numeric-time order within ``by`` groups.
    """
    out_col = out_col or f"{value_col}_interp"
    part = Window.partitionBy(by) if by else Window.partitionBy()
    t = F.unix_micros(F.col(ts_col)).cast("double")

    w_prev = part.orderBy(t).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = part.orderBy(t).rowsBetween(Window.currentRow, Window.unboundedFollowing)

    v = F.col(value_col)
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)

    frac: Column = (t - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)   # leading gap → bfill
        .when(next_v.isNull(), prev_v)   # trailing gap → ffill
        .when(next_t == prev_t, prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return df.withColumn(out_col, interp)
