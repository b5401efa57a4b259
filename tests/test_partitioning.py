"""Partitioning/bucketing/salting: each technique's plan property proven,
not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh"))


def test_bucketed_join_is_shuffle_free(spark, warehouse):
    from dask_ssh_docker_spark.operators.partitioning import (
        bucketed_join,
        write_bucketed,
    )
    from dask_ssh_docker_spark.plans import count_exchanges
    from dask_ssh_docker_spark.sources import load_table

    from dask_ssh_docker_spark.plans import physical_plan

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=f"{warehouse}/bo")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, path=f"{warehouse}/bl")

    # disable broadcast so a shuffle-free plan can ONLY come from bucketing
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert count_exchanges(joined) == 0  # co-located: no shuffle either side
        assert "SortMergeJoin" in physical_plan(joined)
        unbucketed = spark.read.parquet(f"{SF}/orders.parquet").join(li, "o_orderkey")
        assert count_exchanges(unbucketed) >= 2  # the shuffles bucketing removed
        plain = orders.join(li, "o_orderkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_same_rows_as_plain(spark):
    from dask_ssh_docker_spark.operators.partitioning import salted_join
    from dask_ssh_docker_spark.sources import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*"), F.sum(F.col("l_quantity").cast("decimal(12,2)")))
        .first()
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "k"),
            orders.withColumnRenamed("o_orderkey", "k"),
            on="k",
            salt=8,
        )
        .agg(F.count("*"), F.sum(F.col("l_quantity").cast("decimal(12,2)")))
        .first()
    )
    assert tuple(plain) == tuple(salted)


def test_salted_join_distributes_hot_key(spark):
    """A single hot key must spread across ~salt partitions of the shuffle
    key space (here: distinct salt values actually used)."""
    import pandas as pd

    from dask_ssh_docker_spark.operators.partitioning import salted_join

    hot = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 10_000, "v": range(10_000)})
    )
    dim = spark.createDataFrame(pd.DataFrame({"k": [1], "name": ["only"]}))
    out = salted_join(hot, dim, on="k", salt=8)
    assert out.count() == 10_000
    # observe the OPERATOR'S salt expression (not a re-implementation)
    from dask_ssh_docker_spark.operators.partitioning import _left_salt

    used = hot.withColumn("__salt", _left_salt(8)).select("__salt").distinct().count()
    assert used == 8


def test_sorted_range_write_prunes(spark, tmp_path):
    from dask_ssh_docker_spark.operators.partitioning import sorted_range_write
    from dask_ssh_docker_spark.sources import load_table

    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "sorted")
    sorted_range_write(orders, path, "o_orderkey", num_partitions=8)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    filtered = back.filter("o_orderkey < 100")
    assert filtered.count() == orders.filter("o_orderkey < 100").count()
    import glob

    n_files = len(glob.glob(f"{path}/*.parquet"))
    assert n_files >= 4  # range partitioning actually split the key space
    # the range layout clusters the predicate's rows into a strict subset
    # of files (the property min/max stats prune on)
    touched = filtered.select(F.input_file_name()).distinct().count()
    assert touched < n_files


def test_zorder_write_shrinks_both_column_ranges(spark, tmp_path):
    """Z-order layout: per-file min/max spans shrink on BOTH clustered
    columns (single-column sort leaves the second column's span at ~100%
    per file)."""
    import glob

    import pyarrow.parquet as pq

    from dask_ssh_docker_spark.operators.partitioning import (
        sorted_range_write,
        zorder_write,
    )
    from dask_ssh_docker_spark.sources import load_table

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def file_spans(path):
        spans = {"o_custkey": [], "o_totalprice": []}
        glo = {}
        for col in spans:
            row = orders.agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            glo[col] = (row["lo"], row["hi"])
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for col in spans:
                lo, hi = None, None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(cols[col]).statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                g_lo, g_hi = glo[col]
                spans[col].append((hi - lo) / (g_hi - g_lo))
        return {c: sum(v) / len(v) for c, v in spans.items()}

    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "single")
    zorder_write(orders, zpath, "o_custkey", "o_totalprice", num_partitions=8)
    sorted_range_write(orders, spath, "o_custkey", num_partitions=8)

    z = file_spans(zpath)
    s = file_spans(spath)
    # single-column sort: custkey narrow, totalprice ~full span per file
    assert s["o_custkey"] < 0.4
    assert s["o_totalprice"] > 0.85
    # z-order: BOTH columns substantially narrowed
    assert z["o_custkey"] < 0.75, z
    assert z["o_totalprice"] < 0.75, z
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == orders.count()


def test_pin_compute_width_always_pins(spark):
    """pin_compute_width must pin a static shuffle width under EVERY
    coalescing posture: AQE sizes a shuffle by its input bytes, which
    under-parallelizes stages whose output explodes relative to input
    (r8 sf1 sweep: setsim 161 s unpinned vs ~20 s pinned — the sf0.1
    A/B alone could not see the cliff)."""
    from dask_ssh_docker_spark.operators.partitioning import pin_compute_width

    df = spark.range(0, 1000).selectExpr("id", "id % 7 as k")
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    orig = spark.conf.get(key)
    try:
        for posture in ("true", "false"):
            spark.conf.set(key, posture)
            plan = (
                pin_compute_width(df, "k")
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
            assert "RepartitionByExpression" in plan, posture
        assert pin_compute_width(df, "k").count() == 1000
    finally:
        spark.conf.set(key, orig)


def test_salted_topk_identical_to_single_window(spark):
    """r11: the two-round hot-group-safe top-k must return EXACTLY the
    single-window rows and ranks -- including on a hot group bigger than
    salt*k and groups smaller than k -- for any deterministic total
    order (tie-break on the unique salt_on column)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.partitioning import salted_topk

    rows = []
    # hot group: 2000 members, many score ties (forces the id tie-break)
    for i in range(2000):
        rows.append(("hot", i, float(i % 7)))
    # small group: fewer members than k
    for i in range(3):
        rows.append(("tiny", 10_000 + i, float(i)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["grp", "id", "score"])
    )
    order = [F.desc("score"), F.asc("id")]
    plain = salted_topk(df, ["grp"], order, "id", 10, salt=1).toPandas()
    salted = salted_topk(df, ["grp"], order, "id", 10, salt=16).toPandas()
    key = ["grp", "rank"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True),
        salted.sort_values(key).reset_index(drop=True),
    )
    tiny = salted[salted.grp == "tiny"]
    assert len(tiny) == 3 and sorted(tiny["rank"]) == [1, 2, 3]
