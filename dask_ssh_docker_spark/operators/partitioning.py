"""Partitioning, bucketing, and skew tools (SURVEY.md §2.D sorted-index
join row; the "Partitioning & shuffle" scale requirements).

Four layout/skew techniques, each with a test proving its plan or
file-statistics property (tests/test_partitioning.py):

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
- **z-order clustered write**: Morton-interleaved two-column layout so
  min/max file skipping works on BOTH columns, not just the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def _spread_bits16(c: F.Column) -> F.Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    lane (Morton encoding half): 4 shift/mask rounds, all JVM bitwise
    ops inside whole-stage codegen."""
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def z_value(c1: F.Column, c2: F.Column) -> F.Column:
    """Morton (Z-order) interleave of two 16-bit-quantized columns —
    rows close in BOTH dimensions get close z-values."""
    return _spread_bits16(c1.cast("bigint")).bitwiseOR(
        F.shiftleft(_spread_bits16(c2.cast("bigint")), 1)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    num_partitions: int = 8,
) -> None:
    """Z-order clustered write: quantize two numeric columns to 16-bit
    lanes by global min/max scaling (one 1-row aggregate, broadcast
    back), Morton-interleave them, range-partition + sort on the z-value,
    write parquet.

    Why this matters at 100 TB: a single-column sorted write
    (``sorted_range_write``) prunes scans on that ONE column only; the
    z-ordered layout shrinks per-file min/max ranges on BOTH columns
    (~sqrt(files) shrink per dimension), so selective predicates on
    either column skip most files — Delta/Iceberg ``OPTIMIZE ZORDER BY``
    semantics, built from plain repartitionByRange.
    """
    lo1, hi1, lo2, hi2 = "__lo1", "__hi1", "__lo2", "__hi2"
    bounds = df.agg(
        F.min(F.col(col1).cast("double")).alias(lo1),
        F.max(F.col(col1).cast("double")).alias(hi1),
        F.min(F.col(col2).cast("double")).alias(lo2),
        F.max(F.col(col2).cast("double")).alias(hi2),
    )

    def q16(col: str, lo: str, hi: str) -> F.Column:
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(col).cast("double") - F.col(lo)) / span).otherwise(
            F.lit(0.0)
        )
        # NULL column values make frac NULL and Spark's least(NULL, 65535)
        # would silently park them in the TOP lane; pin NULLs to lane 0 so
        # they cluster together at the bottom of the z-curve instead.
        frac = F.coalesce(frac, F.lit(0.0))
        return F.least(F.floor(frac * 65536).cast("bigint"), F.lit(65535))

    staged = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z_value(q16(col1, lo1, hi1), q16(col2, lo2, hi2)))
        .drop(lo1, hi1, lo2, hi2)
    )
    (
        staged.repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def pin_compute_width(df: DataFrame, *cols: str) -> DataFrame:
    """Pin a compute-dense small-byte stage's shuffle width, ALWAYS.

    AQE coalesces a shuffle by its INPUT bytes, under every posture:
    size-targeted coalescing (``parallelismFirst=false``) folds a
    few-MB exchange to 1-2 tasks outright, and parallelism-first
    coalescing still merges it down to ``minPartitionSize`` chunks.
    That is correct for scan/agg stages — and catastrophically wrong
    for the exchanges feeding a stage whose OUTPUT explodes relative
    to its input (per-bucket O(L²) prefix matching, per-candidate
    exact cosines): the few-MB prefix frame at sf1 expands to ~35M
    candidate pairs inside the join, and 2 tasks grind it on 2 cores.
    An explicit repartition is exempt from coalescing, so pinning the
    static session width restores parallelism where AQE cannot see it
    is needed.

    Measured (r8): at sf1, setsim 161 s unpinned vs ~20 s pinned — an
    8× collapse; at sf0.1 the pin costs ~0.15 s of static-exchange
    overhead on a ~1 s query.  The sf1 cliff dominates: always pin.
    (An r8 interim version gated the pin on the coalescing posture;
    the sf1 sweep caught the collapse the sf0.1 A/B could not see.)
    """
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width, *cols)


def salted_topk(
    df: DataFrame,
    part_cols: list[str],
    order_by: list,
    salt_on: str,
    k: int,
    salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact per-group top-k (with exact 1..k ranks) that no single task
    ever computes over a hot group's full row volume (r11; same rationale
    as the exact-dedup salt — AQE cannot split window partitions, and a
    top-k readout window over an unbounded group routes the whole group
    through one sort task).

    Round 1 ranks within ``(part_cols, pmod(xxhash64(salt_on), salt))``
    and keeps rank ≤ k per cell — any global top-k row is within the
    top-k of its own cell, so survivors (≤ salt·k per group) contain the
    exact answer.  Round 2 re-ranks the survivors within ``part_cols``
    over the same total order — a sort of ≤ salt·k rows per group.
    Output rows and ranks are IDENTICAL to the single-window form for
    any deterministic total order (``order_by`` must break ties, e.g. on
    a unique id).  ``salt_on``: a column whose hash spreads group rows
    across cells (any unique-ish id).  Cost: one extra (tiny) exchange.
    ``salt<=1`` degrades to the classic single window."""
    if salt <= 1:
        w = Window.partitionBy(*part_cols).orderBy(*order_by)
        return df.withColumn(rank_col, F.row_number().over(w)).filter(
            F.col(rank_col) <= k
        )
    cell = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
    w1 = Window.partitionBy(*part_cols, "__cell").orderBy(*order_by)
    survivors = (
        df.withColumn("__cell", cell)
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__cell", "__rn1")
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_by)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
