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
    return df.groupBy(*keys).applyInPandas(fn, schema)
