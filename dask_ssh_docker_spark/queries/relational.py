"""Relational core queries (SURVEY.md §2.C scans/filters, §2.D joins,
§2.E aggregations, §2.F sorts/limits/set-ops).

The reference exposes these through dask.dataframe ([Dask public API],
anchor ``/root/reference/dask_ssh_docker/__init__.py:307``); here each is
expressed declaratively on the DataFrame API so Catalyst plans them
(broadcast-hash joins for dims, partial+final hash aggregation,
TakeOrderedAndProject for top-k — SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import PRICE_DEC, RATE_DEC, davg, dec, dsum, sql_davg, sql_dsum
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan → filter → project-expr →
# partial/final hash agg → sort).  SURVEY.md §7 step 1.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
           AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
               * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
           AS DOUBLE) AS sum_charge,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      {sql_davg('l_discount', 'DECIMAL(3,2)')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(RATE_DEC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))
    charge = disc_price * (one + dec("l_tax", RATE_DEC))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", RATE_DEC).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (§2.D)
# ---------------------------------------------------------------------------


@query(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
           AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact shuffle join + dim filter + agg + top-k.

    ``customer`` grows with scale factor, so it gets NO forced broadcast
    hint — AQE's size-based dynamic broadcast picks the strategy at
    runtime (broadcast at small SF, shuffle join at 100 TB).  The
    orders⋈lineitem equi-join shuffles on the order key (at 100 TB both
    facts would be bucketed by orderkey to make this co-located).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    one = F.lit(1).cast(RATE_DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
           AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join.  Only the fixed-cardinality dims (region=5,
    nation=25) carry broadcast hints; customer/supplier grow linearly
    with scale factor, so their join strategy is left to AQE's
    size-threshold dynamic broadcast — forced hints there would OOM
    executors at the 100 TB design point."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    one = F.lit(1).cast(RATE_DEC)
    revenue = dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query(
    "join_semi_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    """,
)
def join_semi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (Dask ``isin`` idiom → Spark-native ``left_semi``)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "join_anti_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "join_left_order_counts",
    oracle=f"""
    SELECT
      c_custkey,
      c_name,
      COUNT(o_orderkey) AS n_orders,
      {sql_dsum('o_totalprice')} AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving unmatched customers (count=0, sum NULL)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_spend"),
        )
    )


@query(
    "join_cross_nation_region",
    oracle="""
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    """,
)
def join_cross_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (Dask merge-on-constant idiom → ``crossJoin``)."""
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    region = load_table(spark, sf_dir, "region").select("r_name")
    return nation.crossJoin(F.broadcast(region))


@query(
    "join_range_theta",
    oracle="""
    SELECT o_orderkey, p_partkey
    FROM orders JOIN part
      ON o_totalprice BETWEEN p_retailprice * 100 AND p_retailprice * 100 + 500
    WHERE o_orderkey <= 100
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join → broadcast nested-loop on the small
    side.  The broadcast hint goes on the *bounded* side (orders filtered
    to a constant key range — fixed size at any SF), never on ``part``,
    which grows with scale factor.  At scale this family needs
    binning/interval-join rewrites; the library form lives in
    ``operators.asof`` for the ordered case."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    part = load_table(spark, sf_dir, "part")
    cond = (orders.o_totalprice >= part.p_retailprice * 100) & (
        orders.o_totalprice <= part.p_retailprice * 100 + 500
    )
    return part.join(F.broadcast(orders), cond).select("o_orderkey", "p_partkey")


# ---------------------------------------------------------------------------
# Filters / projections / row ops (§2.C)
# ---------------------------------------------------------------------------


@query(
    "filter_project_lineitem",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity,
      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
           AS DOUBLE) AS net_price,
      CASE WHEN l_quantity >= 30 THEN 'bulk' ELSE 'small' END AS order_size
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_discount > 0.02
      AND l_quantity <> 25
    """,
)
def filter_project_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: isin / between / comparison / inequality, plus
    computed projection and conditional — all pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(RATE_DEC)
    net = dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))
    return (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .filter(F.col("l_discount") > 0.02)
        .filter(F.col("l_quantity") != 25)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            net.cast("double").alias("net_price"),
            F.when(F.col("l_quantity") >= 30, "bulk")
            .otherwise("small")
            .alias("order_size"),
        )
    )


@query(
    "sample_systematic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (l_orderkey * 2654435761 + l_linenumber) % 20 = 3
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sample (hash-mod on key).  The
    probabilistic ``df.sample(fraction=)`` is exercised in tests; this is
    the reproducible variant an ML pipeline should use for splits."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber")) % 20
    return li.filter(h == 3).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "null_handling",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(*) AS n_rows,
      COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS n_zero_disc,
      CAST(SUM(COALESCE(CAST(NULLIF(l_discount, 0.0) AS DECIMAL(3,2)), CAST(-1 AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null surface: nullif / coalesce / fillna (Dask ``fillna``/``dropna``
    → ``df.na.*`` / ``F.coalesce``)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_n = F.nullif(F.col("l_discount"), F.lit(0.0)).cast(RATE_DEC)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("l_discount") == 0, 1)).alias("n_zero_disc"),
        F.sum(F.coalesce(disc_n, F.lit(-1).cast(RATE_DEC)))
        .cast("double")
        .alias("sum_disc_filled"),
    )


# ---------------------------------------------------------------------------
# Aggregations (§2.E)
# ---------------------------------------------------------------------------


@query(
    "agg_global_stats",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      COUNT(DISTINCT l_partkey) AS n_parts,
      MIN(l_shipdate) AS first_ship,
      MAX(l_shipdate) AS last_ship,
      {sql_dsum('l_quantity')} AS total_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      MIN(l_extendedprice) AS min_price,
      MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global reductions incl. exact distinct counts (Dask
    ``sum/mean/min/max/nunique`` → one pass of Spark partial+final agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_rows,
      {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping-sets rollup (absent in Dask — Spark-native
    extension, SURVEY.md §2.E last row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "value_counts_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def value_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``Series.value_counts`` equivalent."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "agg_corr_stats",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
      ROUND(STDDEV_SAMP(l_discount), 6) AS disc_std,
      ROUND(VAR_SAMP(l_tax), 6) AS tax_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise/statistical moments (Dask ``corr/cov/std/var``), rounded to
    absorb accumulation-order noise in the float moments."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_discount"), 6).alias("disc_std"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-k / dedup / set ops (§2.F)
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nlargest`` → Catalyst TakeOrderedAndProject (per-partition top-k
    + merge; no full sort, no full shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).limit(15)


@query(
    "dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``drop_duplicates(subset=, keep='first')``: unlike raw
    ``dropDuplicates`` (arbitrary survivor), keep the earliest row per key
    with a total tie-break — the semantics a reproducible pipeline needs."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    ordered = orders.select(F.col("o_custkey").alias("c_custkey"))
    return rich.intersect(ordered)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    ordered = orders.select(F.col("o_custkey").alias("c_custkey"))
    return rich.exceptAll(ordered).distinct()


@query(
    "concat_union",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey AS key, 'big' AS bucket, o_totalprice AS price
      FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT o_orderkey AS key, 'tiny' AS bucket, o_totalprice AS price
      FROM orders WHERE o_totalprice < 5000
    )
    """,
)
def concat_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dd.concat(axis=0)`` → ``unionByName``."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("key"),
        F.lit("big").alias("bucket"),
        F.col("o_totalprice").alias("price"),
    )
    tiny = orders.filter(F.col("o_totalprice") < 5000).select(
        F.col("o_orderkey").alias("key"),
        F.lit("tiny").alias("bucket"),
        F.col("o_totalprice").alias("price"),
    )
    return big.unionByName(tiny)


# ---------------------------------------------------------------------------
# Reference smoke parity (BASELINE.md invariant 1):
# dask.delayed(sum)(range(1000)).compute() == 499500
# (/root/reference/example/test.py:23) re-expressed declaratively.
# ---------------------------------------------------------------------------


@query(
    "smoke_delayed_sum",
    oracle="""
    SELECT CAST(SUM(r) AS BIGINT) AS total FROM range(1000) t(r)
    """,
)
def smoke_delayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1000).agg(F.sum("id").cast("bigint").alias("total"))


@query(
    "delayed_api_smoke",
    oracle="""
    SELECT 'custom_func' AS workload,
           CAST(SUM(r + 1) AS BIGINT) AS result FROM range(100) t(r)
    UNION ALL
    SELECT 'delayed_sum' AS workload,
           CAST(SUM(r) AS BIGINT) AS result FROM range(1000) t(r)
    """,
)
def delayed_api_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both reference smoke workloads run through the REAL imperative
    ``delayed`` API (``dask_ssh_docker_spark.delayed`` — task payloads
    cloudpickled onto Spark workers, one job per dependency layer):
    ``delayed(sum)(range(1000))`` (= ``/root/reference/example/test.py:23``)
    and ``delayed(func)(range(100))`` with the custom-image ``func``
    (``/root/reference/example/custom_image/my_library.py``), the list
    result folded to a comparable scalar with a chained delayed node.
    The scalars land in a 2-row frame so the driver's oracle hash covers
    the whole layer end-to-end."""
    from ..delayed import delayed

    total = delayed(sum)(range(1000))
    func_list = delayed(lambda x: [i + 1 for i in x])(range(100))
    func_total = delayed(sum)(func_list)
    rows = [
        ("custom_func", func_total.compute(spark)),
        ("delayed_sum", total.compute(spark)),
    ]
    return spark.createDataFrame(rows, "workload string, result bigint")


@query(
    "futures_api_smoke",
    oracle="""
    SELECT 'map_doubled' AS workload,
           CAST(SUM(r * 2) AS BIGINT) AS result FROM range(10) t(r)
    UNION ALL
    SELECT 'scatter_sum' AS workload,
           CAST(SUM(r) AS BIGINT) AS result FROM range(100) t(r)
    UNION ALL
    SELECT 'submit_chain' AS workload,
           CAST(SUM(r) + 1 AS BIGINT) AS result FROM range(1000) t(r)
    """,
)
def futures_api_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``Client`` futures vocabulary
    (``bin/dask-ssh-docker:77-78`` registers a default dask Client) run
    through the REAL ``dask_ssh_docker_spark.futures.Client``: a
    ``map`` wave gathered as one job, a ``scatter``'d broadcast fed to
    ``submit``, and a chained submit whose dependency runs once.  The
    scalars land in a 3-row frame so the driver's oracle hash covers
    submit/map/scatter/gather end-to-end on executor workers."""
    from ..futures import Client

    client = Client(spark)
    doubled = client.gather(client.map(lambda x: x * 2, range(10)))
    ref = client.scatter(list(range(100)))
    scatter_sum = client.submit(sum, ref).result()
    base = client.submit(sum, range(1000))
    chained = client.submit(lambda s: s + 1, base).result()
    rows = [
        ("map_doubled", sum(doubled)),
        ("scatter_sum", scatter_sum),
        ("submit_chain", chained),
    ]
    return spark.createDataFrame(rows, "workload string, result bigint")


# rendered fixed-width dir per sf_dir (see read_fwf_roundtrip)
_FWF_RENDER_CACHE: dict[str, str] = {}


@query(
    "read_fwf_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def read_fwf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``read_fwf`` end-to-end (§2.B): nation rendered to fixed-width
    text, read back via the substring-projection reader, values proven
    identical to the parquet source by the oracle."""
    import tempfile

    from ..sources import read_fwf

    # Memoized per sf_dir: plan construction is otherwise side-effecting
    # (an eager write job per call) and repeated driver/test sweeps would
    # accumulate temp dirs.  mkdtemp on first use keeps the path private
    # per process — concurrent sessions can never race a shared fixed path.
    path = _FWF_RENDER_CACHE.get(sf_dir)
    if path is None:
        nation = load_table(spark, sf_dir, "nation")
        lines = nation.select(
            F.concat(
                F.rpad(F.col("n_nationkey").cast("string"), 4, " "),
                F.rpad(F.col("n_name"), 26, " "),
                F.rpad(F.col("n_regionkey").cast("string"), 4, " "),
            ).alias("value")
        )
        path = tempfile.mkdtemp(prefix="spark_graft_fwf_") + "/data"
        lines.write.mode("overwrite").text(path)
        _FWF_RENDER_CACHE[sf_dir] = path
    return read_fwf(
        spark,
        path,
        colspecs=[(0, 4), (4, 30), (30, 34)],
        names=["n_nationkey", "n_name", "n_regionkey"],
        dtypes=["long", "string", "long"],
    )


@query(
    "join_full_outer",
    oracle=f"""
    SELECT
      COALESCE(c_custkey, o_custkey) AS custkey,
      c_name,
      o_orderkey,
      o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (``dd.merge(how='outer')``): both unmatched sides
    survive with nulls."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "o_orderkey",
        "o_totalprice",
    )


@query(
    "union_missing_columns",
    oracle="""
    SELECT o_orderkey AS key, o_totalprice AS price, o_orderpriority AS priority
    FROM orders WHERE o_totalprice > 350000
    UNION ALL
    SELECT c_custkey AS key, c_acctbal AS price, NULL AS priority
    FROM customer WHERE c_acctbal > 9000
    """,
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dd.concat(axis=0)`` with heterogeneous schemas →
    ``unionByName(allowMissingColumns=True)`` null-fills the gaps."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 350000
    ).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("price")
    )
    return orders.unionByName(cust, allowMissingColumns=True)


@query(
    "merge_indicator",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL THEN 'both'
                WHEN c.c_custkey IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS _merge,
           COUNT(*) AS n
    FROM (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 8000) c
    FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def merge_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas/Dask ``merge(indicator=True)``: provenance column marking
    both/left_only/right_only per joined key."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .select("c_custkey")
        .distinct()
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    joined = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    merge = (
        F.when(c.c_custkey.isNotNull() & o.o_custkey.isNotNull(), "both")
        .when(c.c_custkey.isNotNull(), "left_only")
        .otherwise("right_only")
    )
    return (
        joined.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            merge.alias("_merge"),
        )
        .groupBy("custkey", "_merge")
        .agg(F.count("*").alias("n"))
    )


@query(
    "explode_outer_null_preserving",
    oracle="""
    SELECT p_partkey, word
    FROM (
      SELECT p_partkey,
             CASE WHEN p_size > 30 THEN string_split(p_name, ' ') END AS words
      FROM part
    ) LEFT JOIN LATERAL unnest(words) AS t(word) ON true
    """,
)
def explode_outer_null_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with a null/empty array survive with a null
    element (plain explode would drop them) — the LEFT-JOIN-LATERAL
    semantics of the SQL oracle."""
    p = load_table(spark, sf_dir, "part")
    words = F.when(F.col("p_size") > 30, F.split("p_name", " "))
    return p.select("p_partkey", F.explode_outer(words).alias("word"))
