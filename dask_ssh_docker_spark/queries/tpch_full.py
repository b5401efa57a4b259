"""Remaining TPC-H query shapes (q2/q4/q7/q8/q9/q11/q13/q15/q16/q17/q18/
q20/q21/q22), adapted to the driver's reduced schema.

The testdata has no ``partsupp`` table and no commit/receipt dates, so the
queries that depend on them (q2, q4, q9, q11, q16, q20, q21) are *shapes*:
the same plan skeleton — correlated scalar subqueries, multi-way join
chains, EXISTS/NOT-EXISTS pairs, IN-over-grouped-HAVING — re-targeted at
the columns that exist, the same way the existing ``q12/q14/q19`` shapes
work (tpch_more.py).

Determinism: all money/measure math in exact DECIMAL (``_util``), doubles
produced by a single identical IEEE op in both engines; every LIMIT is
tie-broken on a unique key.

Scale notes (100 TB): only fixed-cardinality ``nation``/``region`` carry
forced broadcast hints; scalar subqueries broadcast 1-row global
aggregates (bounded forever, exempt from the unbounded-aggregate plan
ban); fact⋈fact joins are left to AQE.  Per-order windows
(q21) partition on the join key already shuffled on — no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import RATE_DEC, dec
from .registry import query

def _rev():
    """l_extendedprice * (1 - l_discount), exact decimal."""
    one = F.lit(1).cast(RATE_DEC)
    return dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))


_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH up AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS part_min FROM up
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost
    FROM ranked
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE unit_cost = part_min AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
    ORDER BY p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp): per part, the supplier(s) achieving
    the minimum observed unit price.  Correlated-min via a window over the
    pre-aggregated (part, supplier) frame — the window partitions on the
    same key the groupBy just shuffled on, so it adds no exchange.  The
    part filter semi-joins the fact *before* the aggregate: at 100 TB the
    min is computed only for qualifying parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    li_f = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
    up = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    cand = (
        up.withColumn("part_min", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("part_min"))
        .drop("part_min")
    )
    return (
        cand.join(part, cand.l_partkey == part.p_partkey)
        .join(supp, cand.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_suppkey")
        .limit(100)
    )


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts of orders with a late-shipping
    lineitem (no receipt/commit dates → late = shipped >30 days after
    order date).  The EXISTS lowers to a left-semi hash join on
    l_orderkey with the date comparison as residual — no dedup pass,
    one shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue, COUNT(*) AS n_ship
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year, {_SQL_REV} AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    ``nation`` joins twice under two aliases — both broadcast (25 rows at
    any SF).  The nation-pair predicate is applied after the broadcast
    joins, so the two fact⋈fact shuffles (lineitem⋈orders⋈customer) carry
    only the date-filtered rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"), F.count("*").alias("n_ship"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year, {_SQL_REV} AS vol,
             n1.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional market volume by year —
    conditional decimal sums, one IEEE division.  nation(×2)/region are
    broadcast; part/supplier/customer joins are AQE-planned (they grow
    with SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    vol = _rev()
    num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(num).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(profit) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {_SQL_REV}
             - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(0.06 AS DECIMAL(3,2)) AS profit
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    ) GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → supply cost proxied as 6% of retail
    price × quantity, exact decimal): profit on a part family by supplier
    nation and order year."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cost = dec("l_quantity") * dec("p_retailprice") * F.lit(0.06).cast(RATE_DEC)
    profit = _rev() - cost
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_suppliers",
    oracle="""
    WITH sv AS (
      SELECT l_suppkey AS suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT suppkey, CAST(v AS DOUBLE) AS total_value
    FROM sv
    WHERE CAST(v AS DOUBLE)
          > 1.05 * (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM sv)
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp → supplier shipped-value share):
    suppliers whose total shipped value exceeds 1.05× the mean supplier
    value (SF-invariant, unlike a fixed fraction of the global total).
    The mean is a 1-row aggregate broadcast (bounded forever); the
    per-supplier frame is computed once and reused for both sides, and
    the threshold comparison happens in identical IEEE doubles in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    sv = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(dec("l_extendedprice")).alias("v")
    )
    mean = sv.agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("t")
    )
    return (
        sv.crossJoin(F.broadcast(mean))
        .filter(F.col("v").cast("double") > F.lit(1.05) * F.col("t"))
        .select("suppkey", F.col("v").cast("double").alias("total_value"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, with a join
    predicate beyond the equi key (priority exclusion folded into the
    orders side — identical semantics for a left join, one shuffle
    each for the join and the two aggregations, all partial-agg
    combined)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS tr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
        AND l_suppkey IS NOT NULL
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE tr = (SELECT MAX(tr) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum half-year revenue.  The MAX
    scalar subquery is a 1-row broadcast; equality is tested on exact
    decimals so ties are engine-independent.

    Single scan (r10 audit): the revenue aggregate feeds both the MAX
    branch and the winner filter.  The supplier join infers
    ``isnotnull(l_suppkey)`` and pushes it into the main branch's scan
    only, so without alignment the two branches' scan filters differ,
    the exchange subtrees stop canonicalizing equal, and the filtered
    lineitem scan + partial aggregate runs TWICE.  The explicit
    ``isNotNull`` below (a no-op on data: l_suppkey is non-null by the
    TPC-H schema contract, and a null key could never join supplier
    anyway) makes both branches scan identically → ReusedExchange
    (plan-pinned).  The oracle mirrors the filter (``AND l_suppkey IS
    NOT NULL``, ADVICE r10) so the pair stays exact even if data ever
    violated the non-null contract — otherwise Spark's MAX would exclude
    a NULL-suppkey revenue group the oracle's ``(SELECT MAX(tr))``
    includes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        & F.col("l_suppkey").isNotNull()
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(dec("l_extendedprice")).alias("tr"))
    mx = rev.agg(F.max("tr").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("tr") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("tr").cast("double").alias("total_revenue"))
    )


@query(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT IN ('ECONOMY', 'PROMO')
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier variety observed from shipments instead
    of partsupp): distinct-supplier counts per part category.  All three
    part predicates reach the part scan; the distinct count expands to
    a two-phase aggregate (partial per partition, final per key)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("ECONOMY", "PROMO"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-average-quantity lineitems of one
    brand.  The correlated per-part average decorrelates to a grouped
    aggregate joined back on partkey; the average frame is semi-filtered
    to the brand's parts first so at 100 TB the per-part aggregate only
    covers qualifying parts.  avg = double(decimal sum)/count and the
    0.2× comparison are the identical IEEE ops in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li_parts = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    avg_q = li_parts.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    avg_q = avg_q.withColumnRenamed("l_partkey", "ap_partkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 120
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sq AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with large-volume orders (IN-over-HAVING
    decorrelated to an aggregate-then-join; the HAVING compares exact
    decimals).  Top-100 tie-broken on the unique order key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 120)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q20_excess_shipments",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%bolt%'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 80
    )
    """,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availability → shipped-quantity
    threshold): suppliers who moved an outsized quantity of any single
    part in a family.  IN-over-grouped-HAVING lowers to a left-semi join
    against the aggregate — no distinct pass on the inner side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    supp = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 80)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >90 days after order date):
    suppliers who were the *sole* late shipper on a multi-supplier
    completed order.  The EXISTS / NOT-EXISTS pair over the same table
    decorrelates to two per-order distinct-supplier counts computed in
    one window pass (partitioned on the join key the rows were already
    shuffled on — no extra exchange, no triple self-join):
    EXISTS(other supplier) ⇔ n_supp ≥ 2; NOT EXISTS(other late supplier)
    on a row that is itself late ⇔ n_late_supp = 1."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    jo = li.join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    w = Window.partitionBy("l_orderkey")
    ann = (
        jo.withColumn("is_late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
        )
    )
    waiting = ann.filter(
        F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT n_name AS cust_nation, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone column → grouped by nation; dormant =
    no order since 2000): above-average-balance customers with no recent
    orders.  Scalar-avg broadcast (1 row) + left-anti join against the
    date-filtered orders + broadcast nation join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cust_nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
