"""Partitioning, bucketing, and skew tools (SURVEY.md §2.D sorted-index
join row; the "Partitioning & shuffle" scale requirements).

Three shuffle-avoidance/skew techniques, each with a test proving its plan
property (tests/test_partitioning.py):

- **bucketed tables**: persist both sides bucketed by the join key →
  repeat joins are co-located (no Exchange on either side).  The Spark
  analog of Dask's sorted-``divisions`` merge join, but durable across
  jobs.
- **salted join**: break a skewed key by exploding the small side into
  ``salt`` replicas and scattering the big side's hot keys across them.
  AQE's skew-join split handles *sort-merge* skew automatically; salting
  is the explicit tool for aggregation skew and for engines/joins AQE
  can't split.
- **range-partitioned sorted write**: ``repartitionByRange +
  sortWithinPartitions`` — the ``set_index`` analog: downstream range
  predicates prune files via min/max statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.  Joins or
    aggregations between tables bucketed identically on the join key run
    without a shuffle on either side."""
    w = df.write.mode("overwrite").format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    shuffle-free by construction (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def _left_salt(salt: int) -> F.Column:
    """The salt routing expression salted_join applies to the large side
    (exposed so tests assert the operator's own distribution, not a
    re-implementation)."""
    return (F.rand(seed=42) * salt).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``left`` (large, skewed) gets a random
    salt in [0, salt); ``right`` (smaller) is replicated ``salt`` times.
    The shuffle key becomes (key, salt) so one hot key spreads over
    ``salt`` reducers.  Row-level results are identical to a plain join
    (randomness only routes rows).

    Only ``inner`` and ``left`` are supported: right/full outer would emit
    one null-padded row per *unmatched replica* of a right row (up to
    ``salt`` spurious rows each) — for outer semantics on a skewed key,
    salt the other side or fall back to AQE skew handling.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}); "
            "right/full outer would duplicate unmatched right replicas"
        )
    l_salted = left.withColumn("__salt", _left_salt(salt))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, [on, "__salt"], how)
    return out.drop("__salt")


def sorted_range_write(
    df: DataFrame, path: str, order_col: str, num_partitions: int = 8
) -> None:
    """``set_index`` analog: range-partition + sort-within, so each output
    file covers a disjoint key range and min/max stats prune scans."""
    (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
