"""Approximate sketches, grouping extensions, custom-aggregation contract
(SURVEY.md §2.E remainder, §7 step 5).

Approx ops (HyperLogLog distinct, t-digest-style quantiles) use different
sketch algorithms per engine → no value-hash oracle; registered rows-only
with error-bound pytest pins (tests/test_approx.py).  Exact-decomposable
custom aggregations (the ``dd.Aggregation`` chunk/agg/finalize contract)
are shown algebraically — partial-aggregatable, hence scalable — with full
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import sql_davg, sql_dsum
from .registry import query


@query("approx_distinct_quantiles", oracle=None)
def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts + approximate percentiles per return
    flag (Dask ``nunique_approx`` / t-digest ``quantile``).  Error bounds
    pinned in tests/test_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10000).alias(
            "price_quartiles"
        ),
        F.count("*").alias("n_rows"),
    )
    # Serialize the quartile array (driver canonicalizer cannot hash lists).
    return agg.select(
        "l_returnflag",
        "approx_parts",
        F.array_join(
            F.transform("price_quartiles", lambda x: F.format_string("%.4f", x)), "|"
        ).alias("price_quartiles"),
        "n_rows",
    ).orderBy("l_returnflag")


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (grouping-sets superset of rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    from ._util import dsum

    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "custom_agg_geomean",
    oracle="""
    SELECT l_returnflag,
           round(exp(SUM(ln(l_extendedprice)) / COUNT(l_extendedprice)), 4)
             AS geomean_price,
           round(exp(AVG(ln(1.0 + l_discount))) - 1.0, 6) AS geomean_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def custom_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dd.Aggregation`` (chunk/agg/finalize) contract, algebraically:
    chunk = partial ``sum(ln x)``/``count``, agg = their merge (built-in),
    finalize = ``exp(sum/count)`` projection.  Fully partial-aggregatable —
    the scalable shape for custom UDAFs; rounded because log/exp are
    transcendental (last-ulp divergence between libm builds).

    Float-sum accumulation order is engine-dependent, but at 4-6dp the
    rounding absorbs it (pinned by the oracle hash at sf0.01).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.exp(F.sum(F.log("l_extendedprice")) / F.count("l_extendedprice")), 4
        ).alias("geomean_price"),
        F.round(F.exp(F.avg(F.log(F.lit(1.0) + F.col("l_discount")))) - 1.0, 6).alias(
            "geomean_discount"
        ),
    )


@query(
    "describe_summary",
    oracle=f"""
    SELECT
      COUNT(o_totalprice)                         AS cnt,
      {sql_davg('o_totalprice')}                  AS mean,
      MIN(o_totalprice)                           AS min_v,
      MAX(o_totalprice)                           AS max_v,
      median(CAST(o_totalprice AS DOUBLE))        AS median_v,
      round(stddev_samp(o_totalprice), 6)         AS std_r
    FROM orders
    """,
)
def describe_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.describe()`` equivalent, exact flavor: count/mean/min/max +
    exact median + rounded stddev."""
    o = load_table(spark, sf_dir, "orders")
    from ._util import davg

    return o.agg(
        F.count("o_totalprice").alias("cnt"),
        davg("o_totalprice").alias("mean"),
        F.min("o_totalprice").alias("min_v"),
        F.max("o_totalprice").alias("max_v"),
        F.median("o_totalprice").alias("median_v"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("std_r"),
    )


@query(
    "group_quantiles_exact",
    oracle="""
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE))
             AS p50,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE))
             AS p90,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE))
             AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def group_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (Dask ``groupby.quantile`` exact flavor).
    Both engines implement SQL percentile_cont linear interpolation on the
    sorted values, so results hash-match without rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with an array of percentages: three
    # scalar percentile() calls each build their own per-group sorted
    # value buffer (3× the memory and sort work); the array form sorts
    # once and reads three order statistics (sf1: 20.9 s cold → ~7 s)
    return li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("__p")
    ).select(
        "l_returnflag",
        F.col("__p")[0].alias("p50"),
        F.col("__p")[1].alias("p90"),
        F.col("__p")[2].alias("p99"),
    )
