"""Custom Python DataSource for .npy embedding shards (sources/npy.py):
multi-shard parallel read, sidecar-id round trip, and error paths."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from dask_ssh_docker_spark.sources.npy import register_npy_source, write_npy_shards


@pytest.fixture(scope="module")
def npy_dir():
    d = tempfile.mkdtemp(prefix="npy_fixture_")
    rng = np.random.default_rng(7)
    np.save(os.path.join(d, "a.npy"), rng.normal(size=(10, 4)).astype(np.float32))
    np.save(os.path.join(d, "b.npy"), rng.normal(size=(6, 4)).astype(np.float32))
    return d


def test_read_multi_shard_values_and_parallelism(spark, npy_dir):
    register_npy_source(spark)
    df = spark.read.format("npy").load(npy_dir)
    assert df.schema.simpleString() == (
        "struct<vec_id:bigint,embedding:array<float>>"
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per shard file
    rows = {r["vec_id"]: r["embedding"] for r in df.collect()}
    expect = np.vstack(
        [np.load(os.path.join(npy_dir, f)) for f in ["a.npy", "b.npy"]]
    )
    assert len(rows) == 16
    assert all(np.allclose(rows[i], expect[i]) for i in range(16))


def test_write_read_roundtrip_preserves_ids(spark, npy_dir):
    register_npy_source(spark)
    df = spark.read.format("npy").load(npy_dir)
    out = tempfile.mkdtemp(prefix="npy_rt_")
    n_shards = write_npy_shards(df.repartition(3), "vec_id", "embedding", out)
    assert n_shards == 3
    back = spark.read.format("npy").load(out)
    a = {(r["vec_id"], tuple(r["embedding"])) for r in df.collect()}
    b = {(r["vec_id"], tuple(r["embedding"])) for r in back.collect()}
    assert a == b  # sidecar ids survive arbitrary repartitioning


def test_empty_dir_raises(spark):
    register_npy_source(spark)
    empty = tempfile.mkdtemp(prefix="npy_empty_")
    with pytest.raises(Exception, match="no .npy shards"):
        spark.read.format("npy").load(empty).count()
