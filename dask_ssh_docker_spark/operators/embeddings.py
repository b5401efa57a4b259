"""Distributed embedding reductions — the Arrow-vectorized scale path.

``queries/embeddings.py`` computes per-label centroids by posexploding to
(label, pos) cells: simple, oracle-matched, but its shuffle is rows×dim
tuples.  This module is the documented upgrade path (SCALE.md): numpy
partial sums per Arrow batch via ``mapInPandas``, so the shuffle carries
only ``partitions × labels`` partial rows (a ~dim× reduction — at 100 TB
with dim=1024 that is the difference between shuffling 100 TB of cells
and a few GB of partials).

Design for Spark's model:

- partial aggregation is expressed IN the engine: mapInPandas emits one
  (label, sum_vector, count) row per label per *batch*, and the final
  combine is a tiny JVM groupBy over those partials — the same
  partial/final split Catalyst generates for built-in aggregates.
- the Python crossing is Arrow-batched; inside the batch it is one
  ``np.add.reduceat``-class operation per label (no per-row Python).
- output arrays are plain ``array<double>``; callers serialize at a
  driver boundary if needed (result-schema policy).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("label", LongType()),
        StructField("psum", ArrayType(DoubleType())),
        StructField("pcnt", LongType()),
    ]
)


def centroids_by_label(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector via map-side numpy partials.

    Returns (label, centroid array<double>, n_vectors).  Equivalent to the
    posexplode formulation (pytest-pinned) with a rows×dim-smaller
    shuffle: each Arrow batch contributes one partial row per label seen
    in the batch.
    """
    import numpy as np

    sel = df.select(
        F.col(label_col).cast("long").alias("label"), F.col(vec_col).alias("vec")
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_labels, out_sums, out_cnts = [], [], []
            for lbl, grp in pdf.groupby("label", sort=False):
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in grp["vec"]]
                )
                out_labels.append(lbl)
                out_sums.append(mat.sum(axis=0))
                out_cnts.append(len(grp))
            yield pd.DataFrame(
                {"label": out_labels, "psum": out_sums, "pcnt": out_cnts}
            )

    part = sel.mapInPandas(partials, schema=_PARTIAL_SCHEMA)
    # final combine: labels × partitions rows — tiny; JVM zip_with sum
    return (
        part.groupBy("label")
        .agg(
            F.aggregate(
                F.collect_list("psum"),
                F.expr("cast(array() as array<double>)"),
                lambda acc, x: F.when(F.size(acc) == 0, x).otherwise(
                    F.zip_with(acc, x, lambda a, b: a + b)
                ),
            ).alias("sumvec"),
            F.sum("pcnt").alias("n_vectors"),
        )
        .select(
            "label",
            F.transform(
                "sumvec", lambda s: s / F.col("n_vectors")
            ).alias("centroid"),
            "n_vectors",
        )
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
