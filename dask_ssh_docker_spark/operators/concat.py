"""Positional column concat — ``dd.concat(axis=1)`` (SURVEY.md §2.D last
row, §7 hard items).

Spark rows have no stable positional identity, so positional alignment
needs an explicit row index.  ``zipWithIndex`` assigns consecutive global
indices with ONE pass (per-partition counts + cumulative offset — cheaper
than a global sort) but routes through the RDD API; the indexed join is
then an ordinary equi-join.

This is deliberately the discouraged path (documented, like Dask's own
warning about concat on unknown divisions): at 100 TB, positional
alignment means both sides must have identical row order end-to-end —
prefer a keyed join whenever any key exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_row_index(df: DataFrame, name: str = "__row_idx") -> DataFrame:
    """Stable 0-based global row index in current partition order
    (RDD ``zipWithIndex`` bridge — one extra pass, no shuffle)."""
    schema = StructType(df.schema.fields + [StructField(name, LongType(), False)])
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    return df.sparkSession.createDataFrame(rdd, schema)


def concat_columns(left: DataFrame, right: DataFrame) -> DataFrame:
    """``dd.concat([l, r], axis=1)``: positional column concatenation.
    Row counts must match (enforced — a silent inner join on row index
    would truncate to the shorter side); result order follows the left
    frame."""
    nl, nr = left.count(), right.count()
    if nl != nr:
        raise ValueError(f"concat(axis=1) row-count mismatch: left={nl} right={nr}")
    li = with_row_index(left)
    ri = with_row_index(right)
    out = li.join(ri, "__row_idx", "inner")
    return out.orderBy("__row_idx").drop("__row_idx")
