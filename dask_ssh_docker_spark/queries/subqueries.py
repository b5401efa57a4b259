"""Correlated/scalar subqueries + the ``spark.sql`` API surface
(SURVEY.md §2.D semi/anti idioms, §3 EP — SQL entry point parity).

These run through ``spark.sql`` over temp views — proving the engine's SQL
catalog surface matches the DataFrame surface (same session, same tables,
same Catalyst planning: EXISTS/IN decorrelate to semi/anti joins, scalar
subqueries to broadcast aggregates).

``l_quantity`` is integer-valued (verified), so double sums/avgs of it are
exact in any accumulation order — safe without decimal casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .registry import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "subq_scalar_small_orders",
    oracle="""
    SELECT l_partkey,
           COUNT(*) AS n_small,
           CAST(SUM(l_quantity) AS DOUBLE) AS small_qty
    FROM lineitem l
    WHERE l_quantity < (
      SELECT 0.5 * AVG(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey
    )
    GROUP BY l_partkey
    """,
)
def subq_scalar_small_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    Catalyst decorrelates to an aggregate + join."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_partkey,
               COUNT(*) AS n_small,
               CAST(SUM(l_quantity) AS DOUBLE) AS small_qty
        FROM lineitem l
        WHERE l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey
        )
        GROUP BY l_partkey
        """
    )


@query(
    "subq_exists_bulk",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o.o_orderkey AND l_quantity >= 48
    )
    GROUP BY o_orderpriority
    """,
)
def subq_exists_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o.o_orderkey AND l_quantity >= 48
        )
        GROUP BY o_orderpriority
        """
    )


@query(
    "subq_not_in_parts",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
    )
    GROUP BY p_brand
    """,
)
def subq_not_in_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (null-safe anti-join semantics; l_partkey is non-null so the
    tri-valued-logic trap stays dormant and both engines agree)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (
          SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
        )
        GROUP BY p_brand
        """
    )


@query(
    "subq_having_big_customers",
    oracle="""
    SELECT c_custkey, c_name, CAST(total_qty AS DOUBLE) AS total_qty
    FROM customer
    JOIN (
      SELECT o_custkey, SUM(l_quantity) AS total_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey
      HAVING SUM(l_quantity) > 1500
    ) big ON c_custkey = big.o_custkey
    """,
)
def subq_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate joined back to the
    dimension."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(total_qty AS DOUBLE) AS total_qty
        FROM customer
        JOIN (
          SELECT o_custkey, SUM(l_quantity) AS total_qty
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY o_custkey
          HAVING SUM(l_quantity) > 1500
        ) big ON c_custkey = big.o_custkey
        """
    )


@query(
    "sql_api_window_share",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(o_totalprice AS DOUBLE)
             / SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey)
             AS spend_share
    FROM orders
    """,
)
def sql_api_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL window query over the registered views (SQL API parity
    with the DataFrame window module)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(o_totalprice AS DOUBLE)
                 / SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey)
                 AS spend_share
        FROM orders
        """
    )
