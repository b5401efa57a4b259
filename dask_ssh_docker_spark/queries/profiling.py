"""Data-profiling and skew-diagnosis queries — the operational tooling a
100 TB engine user runs BEFORE committing to a plan:

- ``profile_orders_columns``: one-pass per-column profile (counts, nulls,
  exact distincts, typed min/max) in long format — the pre-ingest schema
  audit (Dask-era ``df.describe(include='all')`` flavor).
- ``join_skew_audit``: key-frequency diagnosis for a join key with a
  derived salt factor — the measurement that decides between a plain
  shuffle join, AQE skew handling, and explicit salting
  (``operators/partitioning.py:salted_join``).

Determinism: counts are integers; shares are one IEEE division on
identical integers; min/max of doubles are order-insensitive; date
min/max surface as ISO-formatted strings (identical formatting in both
engines); salt factors use pure integer ceil-division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# (column, kind) — kind picks which min/max slot is populated so no
# engine-specific double→string formatting ever enters the result.
_ORDERS_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _ORDERS_COLS:
        if kind == "num":
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
            mns = "CAST(NULL AS VARCHAR)"
            mxs = "CAST(NULL AS VARCHAR)"
        else:  # str and date both render as strings (ISO dates match)
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            mns = f"CAST(MIN({c}) AS VARCHAR)"
            mxs = f"CAST(MAX({c}) AS VARCHAR)"
        parts.append(f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n,
           COUNT(*) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {mns} AS min_str, {mxs} AS max_str
    FROM orders""")
    return " UNION ALL ".join(parts)


@query("profile_orders_columns", oracle=_profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` in long format: row count, null
    count, EXACT distinct count, and typed min/max per column.

    Plan shape: one single-column aggregate PER COLUMN, unioned (the
    same shape as the oracle's UNION ALL).  The tempting alternative —
    every ``count_distinct`` in ONE aggregate — planned as an Expand
    that duplicates each input row (|distinct-aggs|+1)× at full row
    width before aggregating: measured 20.7 s vs 1.5 s at sf1 (r8).
    Per-column branches each scan ONE parquet column (pruning does the
    IO split), aggregate partially map-side, and ship 1 row; all
    branches run in one job.  The 100 TB variant swaps
    ``approx_count_distinct`` sketches into the same plan."""
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for c, kind in _ORDERS_COLS:
        num = kind == "num"
        parts.append(
            orders.select(c).agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                (
                    F.min(c).cast("double") if num else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.max(c).cast("double") if num else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.lit(None).cast("string") if num else F.min(c).cast("string")
                ).alias("min_str"),
                (
                    F.lit(None).cast("string") if num else F.max(c).cast("string")
                ).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SKEW_TOPK = 20
_SKEW_PARTS = 32  # target shuffle parallelism the salt factor is sized for


@query(
    "join_skew_audit",
    oracle=f"""
    WITH freq AS (
      SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT SUM(cnt) AS tot FROM freq)
    SELECT key, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
           CAST((cnt * {_SKEW_PARTS} + tot - 1) // tot AS BIGINT) AS salt_factor
    FROM freq, tot
    ORDER BY cnt DESC, key ASC
    LIMIT {_SKEW_TOPK}
    """,
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis for ``lineitem.l_suppkey``: the 20
    heaviest keys with their frequency share and an integer salt factor
    (how many sub-keys spread this key across {_SKEW_PARTS} target
    partitions).  ``salt_factor == 1`` everywhere → plain shuffle join is
    safe; a key with factor k → pre-split it k ways
    (``operators/partitioning.py:salted_join``) or rely on AQE skew-join.

    Plan shape: one partial-agg'd key-count shuffle + a 1-row total
    broadcast join + TakeOrderedAndProject — the whole audit is one scan
    of the fact table.  Integer ceil-division keeps the salt factor
    bit-exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = freq.agg(F.sum("cnt").alias("tot"))
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("tot").cast("double"), 6).alias(
                "share"
            ),
            F.expr(f"(cnt * {_SKEW_PARTS} + tot - 1) div tot").alias("salt_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(_SKEW_TOPK)
    )


@query(
    "bloom_semi_join_revenue",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
    GROUP BY l_returnflag
    """,
)
def bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag for lineitems from suppliers in nations
    0–4, computed through the bloom semi-join reduction
    (``operators/bloomjoin.py``): a ≤1024-row bitmap of the build keys is
    broadcast and three map-side bit-tests discard non-matching fact rows
    BEFORE the exact semi join — the runtime-filter pattern that cuts the
    fact-side shuffle at 100 TB.  The bloom only prunes; the exact semi
    join makes the result identical to the plain IN-subquery oracle."""
    from ..operators.bloomjoin import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    matched = bloom_semi_join(li, supp, "l_suppkey", "s_suppkey")
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "sample_k_per_group",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-k-per-group sampling (k=3 events per user):
    rank by md5(event_id) inside each group — a seeded shuffle both
    engines reproduce bit-identically — and keep the first k.  The
    eval-set construction primitive ("3 examples per source") without
    ``rand()``'s partition-order nondeterminism.

    Scale shape: ONE hash exchange on the group key + per-group sort;
    per-row state is a counter.  Unlike reservoir sampling on the driver,
    the group never materializes anywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type")
    )


_PAIRS_TOPK = 15


@query(
    "copurchase_part_pairs",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, COUNT(*) AS n_orders
    FROM pairs GROUP BY p1, p2
    ORDER BY n_orders DESC, p1 ASC, p2 ASC
    LIMIT {_PAIRS_TOPK}
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs (market-basket pair mining): parts
    appearing in the same order, counted across orders.

    Scale shape: the self-join is WITHIN the order key — one shuffle of
    lineitem on l_orderkey, then pair expansion is per-order local and
    bounded by lines-per-order² (Poisson(4) here, a handful of rows); the
    pair counts shuffle once on (p1, p2).  This is the a-priori first
    pass; it never builds the part×part matrix."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.select(
        F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("p2")
    ).alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("bo")) & (F.col("a.l_partkey") < F.col("p2")))
        .select(F.col("a.l_orderkey").alias("ok"), F.col("a.l_partkey").alias("p1"), "p2")
        .distinct()
    )
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(_PAIRS_TOPK)
    )


@query(
    "dq_expectations_orders",
    oracle="""
    WITH single AS (
      SELECT COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS nn,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS uq,
             COUNT(CASE WHEN o_totalprice <= 0
                          OR o_totalprice > 10000000 THEN 1 END) AS rng,
             COUNT(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                        THEN 1 END) AS dom,
             COUNT(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                        THEN 1 END) AS fresh
      FROM orders
    ),
    ri AS (
      SELECT COUNT(*) AS v FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'not_null_orderkey' AS check_name, nn AS violations,
           nn = 0 AS passed FROM single
    UNION ALL SELECT 'unique_orderkey', uq, uq = 0 FROM single
    UNION ALL SELECT 'range_totalprice', rng, rng = 0 FROM single
    UNION ALL SELECT 'domain_orderstatus', dom, dom = 0 FROM single
    UNION ALL SELECT 'freshness_orderdate', fresh, fresh = 0 FROM single
    UNION ALL SELECT 'ri_lineitem_orders', v, v = 0 FROM ri
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite data-quality gate (the Deequ / Great-Expectations
    pattern): six declared checks — null, uniqueness, numeric range,
    categorical domain, freshness, and lineitem→orders referential
    integrity — each emitting (check_name, violations, passed).  ALL
    single-table checks fold into ONE conditional-count aggregation pass
    over orders (unpivoted with ``stack``); the RI check is one
    left-anti count.  Violation counts are exact integers.

    Scale: two scans total regardless of how many single-table checks
    are declared — the metrics-collection shape that makes expectation
    suites affordable at 100 TB (never one job per check)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    single = orders.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("nn"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("uq"),
        F.count(
            F.when(
                (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 10000000),
                1,
            )
        ).alias("rng"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
        ).alias("dom"),
        F.count(
            F.when(F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"), 1)
        ).alias("fresh"),
    )
    unpivoted = single.select(
        F.expr(
            "stack(5, 'not_null_orderkey', nn, 'unique_orderkey', uq, "
            "'range_totalprice', rng, 'domain_orderstatus', dom, "
            "'freshness_orderdate', fresh) AS (check_name, violations)"
        )
    )
    ri = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("ri_lineitem_orders").alias("check_name"), "violations")
    )
    return unpivoted.unionByName(ri).select(
        "check_name", "violations", (F.col("violations") == 0).alias("passed")
    )
