"""UDF / UDAF / UDTF surface (SURVEY.md §2.J).

The Dask side of this is ``map_partitions`` / ``apply`` /
``dd.Aggregation`` [Dask public API].  Spark mapping, in preference order:

1. built-in functions (everything in :mod:`..functions` — the hot path);
2. Arrow-batched ``pandas_udf`` / ``mapInPandas`` / ``applyInPandas``
   (these wrappers) — 10-100× faster than row-at-a-time Python UDFs;
3. row UDFs — deliberately not wrapped; if you reach for one, reconsider.

``dd.Aggregation(name, chunk, agg, finalize)``'s partial/final contract maps
to either a GROUPED_AGG ``pandas_udf`` (no partial aggregation — ships
whole groups) or, preferably, an algebraic decomposition into built-in
partial aggregates (sum/count/min/max/...) composed in a final projection.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def map_partitions(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str) -> DataFrame:
    """``dd.map_partitions`` → Arrow-batched ``mapInPandas``.

    ``fn`` receives/returns pandas DataFrames; batches are bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(gen, schema)


def map_overlap(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    before: int,
    after: int,
    schema: str,
    *,
    order_by: list[str],
    by: str | list[str] | None = None,
    chunk_rows: int = 4096,
) -> DataFrame:
    """``dd.DataFrame.map_overlap(fn, before, after)`` [Dask public API].

    Dask hands each positional partition to ``fn`` extended with ``before``
    trailing rows of the previous partition and ``after`` leading rows of
    the next, then drops the halo from the output.  Spark has no positional
    partitions at the API level, so the equivalent is built explicitly:

    1. per ``by``-key (or globally if ``by`` is None — which forces a
       single-partition window and is only for small frames), rows are
       numbered in ``order_by`` order and split into chunks of
       ``chunk_rows``;
    2. each row is exploded into its own chunk (core) plus, where within
       ``before``/``after`` of a boundary, the neighboring chunk (halo) —
       shuffle volume = rows × (1 + (before+after)/chunk_rows), marginal
       for halo ≪ chunk;
    3. ``applyInPandas`` per (key, chunk): ``fn`` sees the halo-extended
       frame in order and must return one output row per input row
       (positionally aligned, like Dask); halo positions are dropped from
       the output.

    ``fn`` must not change the row count, and each output row may depend
    only on input rows within ``[row - before, row + after]`` — exactly
    Dask's contract; computations that reach further (ffill, expanding
    aggregates) produce chunk-boundary-dependent results.  Helper columns
    are stripped before ``fn`` sees the frame.  Scale: the only shuffle is the
    (key, chunk) grouping; chunk size bounds worker memory exactly like
    Dask's partition size does.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    if before >= chunk_rows or after >= chunk_rows:
        raise ValueError("halo must be smaller than chunk_rows")
    reserved = ("__rn", "__rn_max", "__m", "__chunk", "__core")
    clash = [c for c in df.columns if c in reserved]
    if clash:
        # withColumn would silently overwrite and the helper strip would
        # then drop the user's data — refuse instead.
        raise ValueError(
            f"map_overlap reserves helper column names {reserved}; "
            f"input already has {clash} — rename those columns first"
        )

    keys = [by] if isinstance(by, str) else list(by or [])
    w = (
        Window.partitionBy(*keys).orderBy(*order_by)
        if keys
        else Window.orderBy(*order_by)
    )
    # Materialize the row number (and per-key max) in their own projection
    # first: window expressions cannot appear inside a generator (explode)
    # — and the single evaluation also keeps Catalyst from re-deriving
    # them per use.
    wk = Window.partitionBy(*keys) if keys else Window.partitionBy()
    df = df.withColumn("__rn", F.row_number().over(w) - 1).withColumn(
        "__rn_max", F.max("__rn").over(wk)
    )
    rn = F.col("__rn")
    b0 = F.floor(rn / chunk_rows)
    # A chunk b+1 only exists if some row has rn >= (b+1)*chunk_rows;
    # without this guard the tail rows of each key's LAST chunk would spawn
    # a halo-only group whose fn output is entirely discarded (wasted fn
    # invocation + shuffle volume on every call).
    next_chunk_exists = (b0 + 1) * chunk_rows <= F.col("__rn_max")
    memberships = F.array_compact(
        F.array(
            F.struct(b0.alias("c"), F.lit(True).alias("core")),
            # last `before` rows of chunk b are the leading halo of b+1
            F.when(
                F.lit(before > 0)
                & next_chunk_exists
                & (rn >= (b0 + 1) * chunk_rows - before),
                F.struct((b0 + 1).alias("c"), F.lit(False).alias("core")),
            ),
            # first `after` rows of chunk b are the trailing halo of b-1
            F.when(
                F.lit(after > 0) & (b0 > 0) & (rn < b0 * chunk_rows + after),
                F.struct((b0 - 1).alias("c"), F.lit(False).alias("core")),
            ),
        )
    )
    exploded = (
        df.withColumn("__m", F.explode(memberships))
        .select("*", F.col("__m.c").alias("__chunk"), F.col("__m.core").alias("__core"))
        .drop("__m")
    )

    helper = ["__rn", "__rn_max", "__chunk", "__core"]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__rn", kind="mergesort").reset_index(drop=True)
        core = pdf["__core"].to_numpy()
        out = fn(pdf.drop(columns=helper))
        if len(out) != len(pdf):
            raise ValueError(
                f"map_overlap fn must preserve row count: got {len(out)} "
                f"rows for {len(pdf)} inputs"
            )
        return out.iloc[core].reset_index(drop=True)

    pinned = _pin_group_width(exploded, [*keys, "__chunk"])
    return pinned.groupBy(*keys, "__chunk").applyInPandas(apply, schema)


def _pin_group_width(df: DataFrame, keys: list[str]) -> DataFrame:
    """Explicit-width hash repartition on the group keys, which the
    following groupBy/applyInPandas reuses (no second exchange).

    Python-grouped execution is COMPUTE-dense per byte — each group pays
    a per-call Arrow/pandas overhead regardless of its size — so the
    session's size-targeted AQE coalescing (session.py) must not fold
    many small groups onto one worker: a 5 MB shuffle of 15k groups
    coalesced to one partition serialized 15k Python calls (measured
    38 s for a NOOP fn at sf0.1; parallel it is ~1 s).  Explicit
    repartitions are exempt from coalescing by contract."""
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width, *keys)


def groupby_apply(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """``groupby(keys).apply(fn)`` → ``applyInPandas``.

    Ships each whole group to one Python worker — the full-shuffle escape
    hatch.  Keep groups bounded (a single huge key OOMs its worker); prefer
    algebraic built-ins when the aggregation decomposes.
    """
    return _pin_group_width(df, keys).groupBy(*keys).applyInPandas(fn, schema)


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from .shipping import ship_module_by_value as _ship

_ship(__name__)
