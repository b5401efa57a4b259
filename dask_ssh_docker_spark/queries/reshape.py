"""Reshape operators: pivot (wide) and melt/unpivot (long)
(Dask ``pivot_table`` / ``melt`` [Dask public API] — SURVEY.md §2.E
adjacency).

Pivot value columns are fixed, declared lists (both engines and any sane
100 TB plan require knowing the output schema up front — dynamic pivots
need a collect of the key domain first, which ``df.groupBy().pivot(col)``
does implicitly; we pass the explicit domain to keep the plan collect-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import dsum, sql_dsum
from .registry import query

_FLAGS = ["A", "N", "R"]


@query(
    "pivot_returnflag",
    oracle=f"""
    SELECT l_linestatus,
      {sql_dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_A,
      {sql_dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_N,
      {sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_R,
      COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_A,
      COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_N,
      COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pivot_table(index=linestatus, columns=returnflag, values=qty)``
    with an explicit column domain (collect-free plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", _FLAGS)
        .agg(
            dsum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "l_linestatus",
        *[F.col(f"{f}_qty").alias(f"qty_{f}") for f in _FLAGS],
        *[F.coalesce(F.col(f"{f}_n"), F.lit(0)).alias(f"n_{f}") for f in _FLAGS],
    )


@query(
    "melt_unpivot",
    oracle="""
    SELECT o_orderkey, metric, value FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
    )
    WHERE o_orderkey <= 300
    """,
)
def melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``melt`` (wide→long unpivot) via ``DataFrame.unpivot``."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "value")


@query(
    "sort_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_orderkey <= 2000
    ORDER BY l_shipdate, l_orderkey, l_linenumber
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sort_values`` as a full range-partitioned global sort (Spark
    samples range boundaries exactly like Dask's set_index divisions —
    the plan shows Exchange rangepartitioning, not a single-partition
    sort).  Total tie-break keeps it deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select("l_orderkey", "l_linenumber", "l_shipdate").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )


@query(
    "categorical_encode",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS segment_code
    FROM customer
    """,
)
def categorical_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented categorical-dtype mapping (SURVEY.md §7 risks):
    strings → dense integer codes ordered by value.  At scale, build the
    code table once (distinct + window over the tiny domain) and
    broadcast-join it instead of windowing the fact table."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    codes = (
        cust.select("c_mktsegment")
        .distinct()
        .withColumn(
            "segment_code",
            (F.dense_rank().over(Window.orderBy("c_mktsegment")) - 1).cast("bigint"),
        )
    )
    return cust.join(F.broadcast(codes), "c_mktsegment").select(
        "c_custkey", "c_mktsegment", "segment_code"
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@query(
    "get_dummies_segment",
    oracle=f"""
    SELECT c_custkey,
      {", ".join(f"CAST(c_mktsegment = '{s}' AS BIGINT) AS seg_{s.lower()}" for s in _SEGMENTS)}
    FROM customer
    """,
)
def get_dummies_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dd.get_dummies`` (one-hot encode) over a declared category
    domain — like the pivot, the domain is explicit so the output schema
    is known without a collect; each indicator is a map-side CASE column
    (no shuffle at all)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        *[
            (F.col("c_mktsegment") == s).cast("bigint").alias(f"seg_{s.lower()}")
            for s in _SEGMENTS
        ],
    )


@query(
    "groupby_transform_scale",
    oracle="""
    WITH stats AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
             COUNT(*) AS n,
             MIN(o_totalprice) AS mn,
             MAX(o_totalprice) AS mx
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           CASE WHEN st.mx = st.mn THEN 0.0
                ELSE (o.o_totalprice - st.mn) / (st.mx - st.mn) END
             AS price_minmax_scaled,
           o.o_totalprice - st.s / st.n AS price_dev_from_mean
    FROM orders o JOIN stats st ON o.o_custkey = st.o_custkey
    """,
)
def groupby_transform_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupby(...).transform(...)`` (Dask/pandas): per-group statistics
    broadcast back onto every member row — expressed as unordered window
    aggregates over the group key, so it is ONE shuffle on the key and no
    join.  Min-max scaling + deviation-from-mean (mean derived as exact
    decimal sum / count, so both engines divide identical operands;
    std/var are intentionally avoided — engine-order-dependent)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    s = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    n = F.count("*").over(w)
    mn = F.min("o_totalprice").over(w)
    mx = F.max("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(mx == mn, F.lit(0.0))
        .otherwise((F.col("o_totalprice") - mn) / (mx - mn))
        .alias("price_minmax_scaled"),
        (F.col("o_totalprice") - s / n).alias("price_dev_from_mean"),
    )
