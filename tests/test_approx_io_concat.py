"""Approx-sketch error bounds, IO round-trips (§2.B), concat(axis=1)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_bound(spark):
    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.sources import load_table

    got = {
        r.l_returnflag: r.approx_parts
        for r in REGISTRY["approx_distinct_quantiles"].fn(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.10, (k, got[k], e)  # rsd=0.02, 5σ slack


def test_percentile_approx_bracketed(spark):
    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.sources import load_table

    row = (
        REGISTRY["approx_distinct_quantiles"].fn(spark, SF)
        .filter("l_returnflag = 'N'").first()
    )
    q25, q50, q75 = (float(x) for x in row.price_quartiles.split("|"))
    li = load_table(spark, SF, "lineitem").filter("l_returnflag = 'N'")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert lo <= q25 <= q50 <= q75 <= hi


def test_io_roundtrips(spark, tmp_path):
    from dask_ssh_docker_spark.sources import (
        load_table,
        read_csv,
        read_json,
        read_orc,
        read_parquet,
        write_csv,
        write_json,
        write_parquet,
    )

    orders = load_table(spark, SF, "orders").limit(200)
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

    p = str(tmp_path / "p")
    write_parquet(base, p)
    assert read_parquet(spark, p).count() == 200
    # projection + predicate args
    sub = read_parquet(spark, p, columns=["o_orderkey"], where="o_totalprice > 100000")
    assert sub.columns == ["o_orderkey"]

    c = str(tmp_path / "c")
    write_csv(base, c)
    got_csv = read_csv(spark, c, schema="o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string")
    assert got_csv.count() == 200
    assert dict(got_csv.dtypes)["o_totalprice"] == "double"

    j = str(tmp_path / "j")
    write_json(base, j)
    assert read_json(spark, j).count() == 200

    o = str(tmp_path / "o")
    base.write.mode("overwrite").orc(o)
    assert read_orc(spark, o).count() == 200

    # partitioned write → partition pruning via directory layout
    pp = str(tmp_path / "pp")
    write_parquet(base, pp, partition_by=["o_orderstatus"])
    pruned = spark.read.parquet(pp).filter("o_orderstatus = 'O'")
    assert 0 < pruned.count() < 200


def test_concat_axis1_positional(spark):
    from dask_ssh_docker_spark.operators.concat import concat_columns

    left = spark.createDataFrame(pd.DataFrame({"a": [10, 20, 30], "b": ["x", "y", "z"]}))
    right = spark.createDataFrame(pd.DataFrame({"c": [1.5, 2.5, 3.5]}))
    out = concat_columns(left, right).toPandas()
    assert out.columns.tolist() == ["a", "b", "c"]
    assert out["a"].tolist() == [10, 20, 30]
    assert out["c"].tolist() == [1.5, 2.5, 3.5]


def test_sample_fraction_statistics(spark):
    from dask_ssh_docker_spark.sources import load_table

    li = load_table(spark, SF, "lineitem")
    n = li.count()
    s = li.sample(fraction=0.1, seed=42).count()
    assert 0.05 * n < s < 0.15 * n
    # seeded -> reproducible
    assert s == li.sample(fraction=0.1, seed=42).count()


def test_width_bucket_matches_floor_formula(spark):
    from dask_ssh_docker_spark.sources import load_table

    o = load_table(spark, SF, "orders").filter(
        "o_totalprice >= 0 AND o_totalprice < 600000"
    )
    mismatch = o.select(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias("wb"),
        (F.floor(F.col("o_totalprice") / 50000.0).cast("bigint") + 1).alias("ff"),
    ).filter("wb <> ff")
    assert mismatch.count() == 0


def test_read_hdf_plumbs_through_pandas(spark, monkeypatch):
    """No PyTables in the container: assert the wrapper forwards
    path/key/kwargs to pandas.read_hdf and distributes the frame."""
    import pandas as pd

    from dask_ssh_docker_spark.sources import read_hdf

    seen = {}

    def fake_read_hdf(path, key=None, **kw):
        seen.update({"path": path, "key": key, **kw})
        return pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})

    monkeypatch.setattr(pd, "read_hdf", fake_read_hdf)
    df = read_hdf(spark, "/tmp/fake.h5", key="t", start=0)
    assert seen == {"path": "/tmp/fake.h5", "key": "t", "start": 0}
    assert df.count() == 3 and set(df.columns) == {"a", "b"}


def test_read_hdf_without_pytables_raises_informatively(spark):
    import pytest

    from dask_ssh_docker_spark.sources import read_hdf

    with pytest.raises((ImportError, FileNotFoundError)) as ei:
        read_hdf(spark, "/tmp/definitely_missing.h5", key="t")
    # either PyTables is absent (ImportError with remediation) or the
    # file check fires first — both are informative failures, not crashes
    assert "read_hdf" in str(ei.value) or "does not exist" in str(ei.value)
