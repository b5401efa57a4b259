"""Driver-checked query over the custom ``.npy`` Python DataSource
(``sources/npy.py``): the embeddings table is staged as raw numpy shard
files, read back through ``spark.read.format("npy")``, and reduced to
per-vector L2 norms — hash-matched against DuckDB computing the same
norms from the ORIGINAL parquet.  A green row proves the custom source
delivers every float bit-identically (float32 values pass through numpy
untouched; the fold is the fixed-order discipline both engines share).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


def _staged_npy_shards(sf_dir: str, n_shards: int = 4) -> str:
    """Stage embeddings.parquet as ``n_shards`` .npy files (+ id
    sidecars), split deterministically by vec_id order.  Driver-side
    fixture staging (like the streaming slice stager) — the QUERY reads
    the result distributed, one task per shard."""
    import numpy as np
    import pyarrow.parquet as pq

    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{n_shards}".encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_npy_{key}"
    done = os.path.join(base, "_STAGED")
    if not os.path.exists(done):
        import shutil

        # stage into a process-private dir, promote atomically (concurrent
        # driver + engine sessions race here; both must win cleanly)
        shutil.rmtree(base, ignore_errors=True)
        work = f"{base}.tmp{os.getpid()}"
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work)
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)[order]
        ids = ids[order]
        for i, (mrows, irows) in enumerate(
            zip(np.array_split(mat, n_shards), np.array_split(ids, n_shards))
        ):
            np.save(os.path.join(work, f"shard-{i}.npy"), mrows)
            np.save(os.path.join(work, f"shard-{i}.ids.npy"), irows)
        with open(os.path.join(work, "_STAGED"), "w") as f:
            f.write("ok")
        try:
            os.rename(work, base)
        except OSError:
            shutil.rmtree(work, ignore_errors=True)
    return base


@query(
    "npy_source_norms",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b), 6) AS l2sq
    FROM embeddings
    """,
)
def npy_source_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared L2 norm computed from the ``.npy``-staged copy
    of the embeddings table read through the custom Python DataSource —
    must hash-match DuckDB computing the same norms from the original
    parquet (bit-identical float transit through the custom source).

    Scale shape: one partition per shard file (the source's
    ``partitions()`` plan), map-side fold per row, zero shuffles."""
    from ..sources.npy import register_npy_source

    register_npy_source(spark)
    base = _staged_npy_shards(sf_dir)
    df = spark.read.format("npy").load(base)
    l2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return df.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(l2, 6).alias("l2sq"),
    )
