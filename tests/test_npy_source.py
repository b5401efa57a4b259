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


def test_stream_reader_tails_new_shards(spark):
    """readStream.format('npy'): shards appearing after the stream starts
    arrive in later micro-batches; crc32 id blocks keep ids disjoint."""
    import time

    register_npy_source(spark)
    d = tempfile.mkdtemp(prefix="npy_stream_t_")
    np.save(os.path.join(d, "s0.npy"), np.ones((4, 3), dtype=np.float32))
    out = tempfile.mkdtemp(prefix="npy_stream_t_out_")
    ckpt = tempfile.mkdtemp(prefix="npy_stream_t_ckpt_")
    q = (
        spark.readStream.format("npy")
        .load(d)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    def rows_now() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:  # sink dir not yet readable (no committed batch)
            return -1

    try:
        deadline = time.time() + 45
        while time.time() < deadline and rows_now() < 4:
            time.sleep(1)
        np.save(os.path.join(d, "s1.npy"), 2 * np.ones((5, 3), dtype=np.float32))
        while time.time() < deadline and rows_now() < 9:
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 9
    assert got.select("vec_id").distinct().count() == 9  # disjoint id blocks
