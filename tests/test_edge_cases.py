"""Empty/degenerate-input robustness of the custom operators."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_kv(spark):
    return spark.createDataFrame([], "k long, t long, v double")


def test_merge_asof_empty_right(spark, empty_kv):
    from dask_ssh_docker_spark.operators.asof import merge_asof

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [5], "lv": [1.0]}))
    out = merge_asof(left, empty_kv.withColumnRenamed("v", "rv").drop("lv", "v"), on="t", by="k").toPandas()
    assert len(out) == 1  # left preserved
    assert out["t_right"].isna().all()  # no match -> nulls


def test_merge_asof_empty_left(spark, empty_kv):
    from dask_ssh_docker_spark.operators.asof import merge_asof

    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [5], "rv": [1.0]}))
    out = merge_asof(empty_kv.withColumnRenamed("v", "lv"), right, on="t", by="k")
    assert out.count() == 0
    assert "rv" in out.columns  # schema still complete


def test_dedup_empty_and_single(spark):
    from dask_ssh_docker_spark.operators.dedup import (
        exact_dedup_groups,
        jaccard_pairs_exact,
        minhash_dedup,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup_groups(empty, "text", "doc_id").count() == 0
    assert jaccard_pairs_exact(empty, "text", "doc_id").count() == 0
    assert minhash_dedup(empty, "text", "doc_id").count() == 0

    one = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["solo doc here"]}))
    cl = minhash_dedup(one, "text", "doc_id").collect()
    assert len(cl) == 1 and cl[0].cluster_id == 1 and cl[0].is_canonical


def test_similarity_empty_corpus(spark):
    from dask_ssh_docker_spark.operators.similarity import brute_force_topk

    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": [1], "embedding": [[1.0, 0.0]]})
    )
    corpus = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert brute_force_topk(queries, corpus, k=5).count() == 0


def test_interpolate_all_null_group(spark):
    from dask_ssh_docker_spark.operators.interpolate import interpolate_linear

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01", "2024-01-02"]),
            "v": [None, None, 1.0, 3.0],
        }
    )
    out = (
        interpolate_linear(spark.createDataFrame(pdf), "ts", "v", by="k")
        .toPandas()
        .sort_values(["k", "ts"])
    )
    # group 1 has nothing to interpolate from -> stays null; group 2 intact
    assert out[out.k == 1]["v_interp"].isna().all()
    assert out[out.k == 2]["v_interp"].tolist() == [1.0, 3.0]


def test_rollup_cascade_empty(spark):
    from dask_ssh_docker_spark.operators.rollup_cascade import reaggregate, rollup_hourly

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    assert reaggregate(rollup_hourly(empty), "1 day").count() == 0


def test_cumulative_product_sign_and_zero(spark):
    """cumprod helper: parity of negatives, zero pinning, pandas parity."""
    from pyspark.sql import Window

    from dask_ssh_docker_spark.functions import cumulative_product

    vals = [2.0, -3.0, -0.5, 4.0, 0.0, -2.0, 5.0]
    pdf = pd.DataFrame({"k": 1, "i": range(len(vals)), "x": vals})
    df = spark.createDataFrame(pdf)
    w = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.select("i", cumulative_product("x", w).alias("cp"))
        .toPandas()
        .sort_values("i")["cp"]
        .to_numpy()
    )
    expect = pdf["x"].cumprod().to_numpy()
    import numpy as np

    assert np.allclose(out, expect, rtol=1e-12, atol=1e-12), (out, expect)
    # once a zero enters the prefix, the product stays exactly 0.0
    assert all(v == 0.0 for v in out[4:])


def test_cumulative_product_null_skipna_semantics(spark):
    """NULL factor → NULL at its own row, skipped downstream (pandas
    Series.cumprod skipna=True), never silently treated as 1.0."""
    from pyspark.sql import Window

    from dask_ssh_docker_spark.functions import cumulative_product

    pdf = pd.DataFrame({"k": 1, "i": range(4), "x": [2.0, None, 3.0, -1.0]})
    df = spark.createDataFrame(pdf)
    w = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.select("i", cumulative_product("x", w).alias("cp"))
        .toPandas()
        .sort_values("i")["cp"]
        .tolist()
    )
    assert out[0] == 2.0
    assert out[1] is None or pd.isna(out[1])
    assert abs(out[2] - 6.0) < 1e-12 and abs(out[3] + 6.0) < 1e-12
