"""Incremental materialized-view maintenance: a streaming ``foreachBatch``
loop that folds each micro-batch's *partial aggregates* into a versioned
per-key snapshot — the lakehouse "streaming upsert MV" pattern (Delta
``MERGE`` in ``foreachBatch``) built from plain parquet + an atomic
pointer file.

Per micro-batch:

1. aggregate the batch to per-key partials (map-side combine inside the
   batch — only the partial frame shuffles, never raw rows);
2. full-outer join the partials against the current snapshot and combine
   mergeable metrics (sum/count → ``+``, min → ``least``, max →
   ``greatest``);
3. write the merged snapshot to a NEW version directory and atomically
   swing the ``_LATEST`` pointer (``os.replace``).

Exactly-once: the pointer records the epoch that produced it; a replayed
epoch (crash between snapshot write and checkpoint commit) sees
``pointer_epoch >= epoch_id`` and skips — the merge is never applied
twice.  A real table format (Delta/Iceberg) replaces the pointer dance
with ACID commits; the per-batch *plan* — partial agg + key-partitioned
merge join — is identical.

Scale shape (100 TB): per batch, one partial-agg shuffle over the batch
(bounded by batch size) + one key-partitioned merge join against the
snapshot.  Snapshot size is key-cardinality, not stream length; combine
functions must be commutative+associative, so batch arrival order can't
change the result.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KINDS = ("sum", "count", "min", "max")


def combine_snapshots(
    old: DataFrame, new: DataFrame, keys: list[str], kinds: Mapping[str, str]
) -> DataFrame:
    """Merge two per-key partial-aggregate frames (same schema): keys are
    coalesced, each metric combined per its algebraic kind."""
    o, n = old.alias("o"), new.alias("n")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
    cols = [F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    for name, kind in kinds.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported merge kind {kind!r} for {name!r}")
        a, b = F.col(f"o.{name}"), F.col(f"n.{name}")
        if kind in ("sum", "count"):
            c = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)
        elif kind == "min":
            c = F.least(a, b)  # least/greatest skip NULLs in Spark SQL
        else:
            c = F.greatest(a, b)
        cols.append(c.alias(name))
    return o.join(n, cond, "full_outer").select(*cols)


def _read_pointer(snapshot_dir: str) -> tuple[int, str] | None:
    p = os.path.join(snapshot_dir, "_LATEST")
    if not os.path.exists(p):
        return None
    epoch_s, vdir = open(p).read().strip().split("\t")
    return int(epoch_s), vdir


def read_mv(
    spark: SparkSession, snapshot_dir: str, version: int | None = None
) -> DataFrame:
    """Load a snapshot: the current one (follows the ``_LATEST`` pointer)
    or, with ``version=``, a specific retained epoch — Delta-style time
    travel (``VERSION AS OF``); old version directories are retained, so
    any committed epoch stays readable until the caller prunes them."""
    if version is not None:
        vdir = os.path.join(snapshot_dir, f"v{version}")
        if not os.path.isdir(vdir):
            raise FileNotFoundError(
                f"snapshot version {version} not found under {snapshot_dir}"
            )
        return spark.read.parquet(vdir)
    ptr = _read_pointer(snapshot_dir)
    if ptr is None:
        raise FileNotFoundError(f"no committed snapshot under {snapshot_dir}")
    return spark.read.parquet(ptr[1])


def incremental_agg_mv(
    stream: DataFrame,
    partial_agg: Callable[[DataFrame], DataFrame],
    keys: list[str],
    kinds: Mapping[str, str],
    snapshot_dir: str,
    checkpoint: str,
):
    """Start the MV-maintenance stream (availableNow trigger — processes
    everything currently available, then stops).  Returns the streaming
    query handle; read the result with :func:`read_mv`.

    ``partial_agg`` maps a batch DataFrame to per-key partials whose
    metric columns are each mergeable under ``kinds[name]``.  Metrics
    that are NOT algebraically mergeable (exact distinct, exact median)
    need a sketch column instead (HLL / quantile sketch — see
    ``operators/rollup_cascade.py``).
    """
    os.makedirs(snapshot_dir, exist_ok=True)

    def update(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr = _read_pointer(snapshot_dir)
        if ptr is not None and ptr[0] >= epoch_id:
            return  # replayed epoch: snapshot already includes this batch
        part = partial_agg(batch_df)
        schema = part.schema  # pin: combine widens decimal sums by 1 digit/merge
        if ptr is not None:
            merged = combine_snapshots(spark.read.parquet(ptr[1]), part, keys, kinds)
            # cast back to the partial schema so every snapshot version is
            # schema-identical; callers must size decimal partials with
            # enough headroom for the running total (documented above)
            part = merged.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema]
            )
        vdir = os.path.join(snapshot_dir, f"v{epoch_id}")
        part.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(snapshot_dir, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(f"{epoch_id}\t{vdir}")
        os.replace(tmp, os.path.join(snapshot_dir, "_LATEST"))

    return (
        stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
