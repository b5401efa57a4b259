"""Custom Python DataSource: a directory of ``.npy`` embedding shards as
a Spark table — the raw format training pipelines actually emit (numpy
arrays, one shard per worker), which Spark has no native reader for.

Built on the Spark 4 Python DataSource API
(``pyspark.sql.datasource``): one :class:`InputPartition` PER SHARD
FILE, so a directory of N shards reads with N-way parallelism and each
task memory-maps only its own file — the same split-per-file discipline
as the parquet reader.  Rows are ``(vec_id, embedding)`` where
``vec_id = shard_offset + row_index`` (shards are sorted by filename and
offsets precomputed from the headers ONLY — planning never loads array
data).

Arrow note: the reader yields per-shard ``pyarrow.RecordBatch`` objects
(the API's vectorized path) — the numpy matrix crosses into Arrow as one
batch per shard, not row-by-row Python objects.

Usage::

    spark.dataSource.register(NpyDataSource)
    df = spark.read.format("npy").load("/path/to/shards")

Writer counterpart: :func:`write_npy_shards` (one ``.npy`` per
partition via ``foreachPartition``-free ``mapInArrow`` pass-through).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


class _Shard(InputPartition):
    def __init__(self, path: str, offset: int):
        self.path = path
        self.offset = offset


def _npy_header_rows(path: str) -> int:
    """Row count from the .npy header alone (no data load)."""
    import numpy as np

    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, _, _ = np.lib.format._read_array_header(f, version)
    return shape[0]


class NpyDataSourceReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npy source requires a path (directory of .npy shards)")

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".npy") and not f.endswith(".ids.npy")
        )
        if not files:
            raise FileNotFoundError(f"no .npy shards under {self.path}")
        parts, offset = [], 0
        for p in files:
            parts.append(_Shard(p, offset))
            offset += _npy_header_rows(p)
        return parts

    def read(self, partition: _Shard):
        import numpy as np
        import pyarrow as pa

        mat = np.load(partition.path, mmap_mode="r")
        n, dim = mat.shape
        flat = pa.array(
            np.asarray(mat, dtype=np.float32).ravel(), type=pa.float32()
        )
        emb = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.field("element", pa.float32(), nullable=False))
        )
        # a writer-produced sidecar carries the original ids; synthesized
        # shard-offset ids otherwise
        sidecar = partition.path[: -len(".npy")] + ".ids.npy"
        if os.path.exists(sidecar):
            ids = pa.array(np.load(sidecar).astype("int64"), type=pa.int64())
        else:
            ids = pa.array(
                range(partition.offset, partition.offset + n), type=pa.int64()
            )
        yield pa.RecordBatch.from_arrays([ids, emb], names=["vec_id", "embedding"])


class NpyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return NpyDataSourceReader(self.options)

    def streamReader(self, schema):
        return NpyStreamReader(self.options)


def register_npy_source(spark) -> None:
    """Idempotent registration of the ``npy`` format on a session."""
    spark.dataSource.register(NpyDataSource)


def write_npy_shards(df, id_col: str, vec_col: str, out_dir: str) -> int:
    """Write ``(id, vector)`` rows as per-partition ``.npy`` shards
    (ids as a sidecar ``.ids.npy``) — the inverse of the reader, for
    handing embeddings to a numpy/torch consumer.  Executor-side writes
    via ``mapInArrow`` (each task writes ONLY its partition; no driver
    collect); returns the number of shards written."""
    import numpy as np
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def _write(batches):
        import uuid

        rows, ids = [], []
        for b in batches:
            d = b.to_pydict()
            ids.extend(d[id_col])
            rows.extend(d[vec_col])
        if rows:
            tag = uuid.uuid4().hex[:12]
            np.save(os.path.join(out_dir, f"shard-{tag}.npy"),
                    np.asarray(rows, dtype=np.float32))
            np.save(os.path.join(out_dir, f"shard-{tag}.ids.npy"),
                    np.asarray(ids, dtype=np.int64))
            yield pa.RecordBatch.from_arrays([pa.array([len(rows)])], names=["n"])

    out = df.select(id_col, vec_col).mapInArrow(_write, "n long")
    return out.count()


class NpyStreamReader(DataSourceStreamReader):
    """Streaming flavor (``spark.readStream.format("npy")``): tail a
    shard directory — each micro-batch picks up the ``.npy`` files that
    appeared since the last committed offset.

    Offsets are ``{"files": sorted-list-of-consumed-shard-names}``: the
    SET is the offset, so a replayed (start, end] range re-reads exactly
    the same shards — the exactly-once replay contract of the stream
    reader API.  Rows carry sidecar ids when present; otherwise each
    shard gets a disjoint crc32-keyed id block (shards arrive
    independently, so sequential offsets can't be assigned without
    global coordination).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npy stream source requires a path")

    def initialOffset(self):
        return {"files": []}

    def _current_files(self):
        return sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(".npy") and not f.endswith(".ids.npy")
        )

    def latestOffset(self):
        return {"files": self._current_files()}

    def partitions(self, start, end):
        import zlib

        new = [f for f in end["files"] if f not in set(start["files"])]
        return [
            _Shard(os.path.join(self.path, f), zlib.crc32(f.encode()) << 21)
            for f in new
        ]

    def read(self, partition):
        return NpyDataSourceReader({"path": os.path.dirname(partition.path)}).read(
            partition
        )

    def commit(self, end):
        pass


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
