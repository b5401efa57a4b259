"""Relational core: per-operator-family unit tests on tiny literal frames
plus sf0.001 smoke of the registered queries (SURVEY.md §5 strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_smoke_delayed_sum(spark):
    # Reference smoke invariant 1 (/root/reference/example/test.py:23):
    # sum(range(1000)) == 499500, re-expressed declaratively.
    got = spark.range(1000).agg(F.sum("id")).collect()[0][0]
    assert got == 499500


def test_custom_image_func_semantics(spark):
    # Reference smoke invariant 2 (example/custom_image/my_library.py:1-2):
    # func(range(100)) -> [i+1 for i in range(100)] == [1..100]
    out = (
        spark.range(100)
        .select((F.col("id") + 1).alias("v"))
        .orderBy("v")
        .agg(F.collect_list("v"))
        .collect()[0][0]
    )
    assert out == list(range(1, 101))


def test_join_row_count_bounds(spark, sf_dir):
    from dask_ssh_docker_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    inner = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    left = orders.join(cust, orders.o_custkey == cust.c_custkey, "left").count()
    assert inner <= left
    assert left >= orders.count()


def test_semi_anti_partition(spark, sf_dir):
    from dask_ssh_docker_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").count()
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    assert semi + anti == cust.count()


def test_dedup_idempotent(spark, sf_dir):
    from dask_ssh_docker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    once = li.dropDuplicates()
    assert once.count() == once.dropDuplicates().count()


def test_all_registered_queries_run(spark, sf_dir):
    from dask_ssh_docker_spark.queries import REGISTRY

    for name, spec in REGISTRY.items():
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_hll_cascade_equals_direct_sketch(spark, sf_dir):
    """HLL sketches are order-insensitive and mergeable: the union of
    hourly user sketches must estimate EXACTLY what a direct daily sketch
    estimates (same registers), and land within 5% of exact distinct."""
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.rollup_cascade import (
        reaggregate,
        rollup_hourly,
    )
    from dask_ssh_docker_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = reaggregate(rollup_hourly(ev), "1 day")
    direct = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "direct_est", "exact")
    )
    j = daily.join(direct, ["bucket_start", "event_type"]).collect()
    assert j
    for r in j:
        assert r.approx_users == r.direct_est  # identical merged registers
        assert abs(r.approx_users - r.exact) <= max(1, 0.05 * r.exact)
