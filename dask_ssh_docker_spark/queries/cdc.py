"""CDC / snapshot-maintenance queries: MERGE-INTO upsert and SCD Type-2
dimension history, driver-checked against DuckDB oracles.

Reference parity: Dask users maintain mutable snapshots with
``DataFrame.update`` / ``combine_first`` / indexed assignment (the
collection API the reference deploys); the warehouse-native equivalents
are ``MERGE INTO`` and slowly-changing-dimension builds.  Implemented in
``operators/cdc.py`` as single-shuffle DataFrame plans.

Determinism: the updated account balance is computed in exact DECIMAL on
both engines and cast to DOUBLE once at the end (see ``_util``); the
magnitudes stay far below 2^53 so the final cast is exact in both.

Scale notes (100 TB):

- ``cdc_merge_upsert``: one full-outer sort-merge join on the key —
  both sides shuffle once; no broadcast hint (a CDC batch can be huge;
  AQE broadcasts small ones on its own).
- ``scd2_priority_history``: two stacked windows over the same
  (key, time) ordering — Catalyst plans ONE hash exchange; per-key state
  is a single lag/lead row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cdc import merge_upsert, scd2_from_changelog, snapshot_diff
from ..sources import load_table
from .registry import query

# Target snapshot: customers whose key isn't divisible by 3 (a stale copy
# missing one third of the universe). Source batch: the fresh image of
# every customer with at least one order — balance bumped by 0.1% of
# lifetime spend. The merge must update matched rows, insert the missing
# ones, and pass untouched rows through.
_MERGE_ORACLE = """
WITH target AS (
  SELECT c_custkey, c_name, c_nationkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 3 <> 0
),
spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS s
  FROM orders GROUP BY o_custkey
),
src AS (
  SELECT c.c_custkey, c.c_name, c.c_nationkey,
         CAST(CAST(c.c_acctbal AS DECIMAL(12,2))
              + sp.s * CAST(0.001 AS DECIMAL(4,3)) AS DOUBLE) AS acctbal,
         c.c_mktsegment
  FROM customer c JOIN spend sp ON c.c_custkey = sp.o_custkey
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.acctbal ELSE t.acctbal END AS acctbal,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
FROM target t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
"""


@query("cdc_merge_upsert", oracle=_MERGE_ORACLE)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO a stale customer snapshot from a fresh CDC batch
    (updated balances for every customer with orders): matched rows take
    the source image, unmatched source rows insert, unmatched target rows
    pass through (``operators/cdc.py:merge_upsert``)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    shape = [
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        "c_mktsegment",
    ]
    target = cust.filter(F.col("c_custkey") % 3 != 0).select(*shape)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("s")
    )
    source = (
        cust.join(spend, cust.c_custkey == spend.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (
                F.col("c_acctbal").cast("decimal(12,2)")
                + F.col("s") * F.lit("0.001").cast("decimal(4,3)")
            )
            .cast("double")
            .alias("acctbal"),
            "c_mktsegment",
        )
    )
    return merge_upsert(target, source, ["c_custkey"])


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         lag(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
  FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
)
SELECT o_custkey, o_orderkey, o_orderpriority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       lead(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL AS is_current
FROM changes
"""


@query("scd2_priority_history", oracle=_SCD2_ORACLE)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's order-priority "attribute":
    change events (priority differs from the previous order, ordered by
    date with orderkey tiebreak) become versions with
    valid_from/valid_to/is_current via one lead window per key
    (``operators/cdc.py:scd2_from_changelog``)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    )
    out = scd2_from_changelog(
        changes, key="o_custkey", ts_col="o_orderdate", order_extra=("o_orderkey",)
    )
    return out.select(
        "o_custkey", "o_orderkey", "o_orderpriority", "valid_from", "valid_to", "is_current"
    )


_DIFF_ORACLE = """
WITH old AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
  FROM customer WHERE c_custkey % 7 <> 0
),
new AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 2 = 0
              THEN CAST(CAST(c_acctbal AS DECIMAL(12,2))
                        + CAST(100.00 AS DECIMAL(5,2)) AS DOUBLE)
              ELSE CAST(c_acctbal AS DOUBLE) END AS acctbal
  FROM customer WHERE c_custkey % 5 <> 0
)
SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            WHEN o.c_name IS DISTINCT FROM n.c_name
                 OR o.acctbal IS DISTINCT FROM n.acctbal THEN 'update'
            ELSE 'unchanged' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
"""


@query("cdc_snapshot_diff", oracle=_DIFF_ORACLE)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-set between two customer snapshots (different key subsets,
    even keys get a balance bump): each key tagged
    insert/delete/update/unchanged via ``operators/cdc.py:snapshot_diff``
    — one full-outer shuffle join, null-safe map-side comparisons."""
    cust = load_table(spark, sf_dir, "customer")
    old = cust.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    new = cust.filter(F.col("c_custkey") % 5 != 0).select(
        "c_custkey",
        "c_name",
        F.when(
            F.col("c_custkey") % 2 == 0,
            (
                F.col("c_acctbal").cast("decimal(12,2)")
                + F.lit("100.00").cast("decimal(5,2)")
            ).cast("double"),
        )
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("acctbal"),
    )
    return snapshot_diff(old, new, ["c_custkey"])


_GDPR_HEX = "03"  # md5 prefix < '03' → ~1.2% of customers tombstoned


@query(
    "gdpr_cascade_delete_audit",
    oracle=f"""
    WITH tomb AS (
      SELECT c_custkey FROM customer
      WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '{_GDPR_HEX}'
    ),
    ords AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM tomb)
    ),
    c AS (
      SELECT 'customer' AS table_name,
             (SELECT COUNT(*) FROM customer) AS n_total,
             (SELECT COUNT(*) FROM tomb) AS n_purged
      UNION ALL
      SELECT 'orders',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM ords)
      UNION ALL
      SELECT 'lineitem',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM ords))
    )
    SELECT table_name, n_total, n_purged,
           n_total - n_purged AS n_retained
    FROM c
    """,
)
def gdpr_cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a deterministic
    tombstone set (~1.2% of customers via md5 hex-prefix — standing in
    for an erasure-request table), count the rows each referential hop
    would purge: customer → orders (FK o_custkey) → lineitem (FK
    l_orderkey).  The dry-run accounting a deletion pipeline emits
    before executing the actual anti-join rewrite (which is the same
    plan with ``left_anti`` in place of the counting semi join).

    Determinism: md5 membership (re-partition-stable, engine-portable);
    pure integer counts.

    Scale: two key-propagation semi joins, each shuffling only the
    (shrinking) key frontier — never table payloads; the per-table
    counts are 1-row aggregates unioned into the 3-row report."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    tomb = cust.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
        < _GDPR_HEX
    ).select("c_custkey")
    ords = orders.join(
        tomb, orders.o_custkey == tomb.c_custkey, "left_semi"
    ).select("o_orderkey")
    li_hit = li.join(
        ords, li.l_orderkey == ords.o_orderkey, "left_semi"
    )

    def row(name: str, total_df: DataFrame, purged_df: DataFrame) -> DataFrame:
        t = total_df.agg(F.count(F.lit(1)).alias("n_total"))
        p = purged_df.agg(F.count(F.lit(1)).alias("n_purged"))
        return (
            t.crossJoin(p)
            .select(
                F.lit(name).alias("table_name"),
                "n_total",
                "n_purged",
                (F.col("n_total") - F.col("n_purged")).alias("n_retained"),
            )
        )

    return (
        row("customer", cust, tomb)
        .unionByName(row("orders", orders, ords))
        .unionByName(row("lineitem", li, li_hit))
    )
