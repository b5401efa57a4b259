"""UDF-surface + multimodal queries (SURVEY.md §2.J, §2.H multimodal).

- ``multimodal_blob_metadata``: BinaryType plumbing fully JVM-side,
  oracle-checked (blob = utf-8 bytes of documents.text standing in for
  image bytes; size/sha256/head-hex work identically on real blobs).
- ``udf_groupby_apply_median``: ``applyInPandas`` escape hatch with
  order-insensitive exact statistics so the oracle can hash-match.
- ``udf_frame_offsets``: video frame-sampling plumbing (JVM sequence math).
- ``multimodal_decode_stub``: Arrow-batched decode with the deterministic
  fake decoder — rows-only check (hashlib fake has no SQL twin);
  pytest pins the real/fake switch and schema.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udf import groupby_apply
from ..operators.multimodal import decode_image_meta, sample_frame_offsets, with_blob_metadata
from ..sources import load_table
from .registry import query


@query(
    "multimodal_blob_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))               AS blob_size,
           sha256(text)                             AS blob_sha256,
           upper(hex(encode(substring(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def multimodal_blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob metadata, computed without any decoder: byte size,
    content hash, head bytes (the format-sniff input)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    df = docs.withColumn("__blob", blob)
    out = with_blob_metadata(df, "__blob")
    return out.select(
        "doc_id",
        "blob_size",
        "blob_sha256",
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias("head_hex"),
    )


@query(
    "udf_groupby_apply_median",
    oracle="""
    SELECT o_custkey,
           COUNT(*)                          AS n_orders,
           median(CAST(o_totalprice AS DOUBLE)) AS median_price,
           MIN(o_totalprice)                 AS min_price,
           MAX(o_totalprice)                 AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def udf_groupby_apply_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupby.apply`` surface (applyInPandas): per-customer order-price
    stats computed in numpy/pandas.  Median/min/max/count are
    order-insensitive and exact → hash-matchable against SQL."""
    orders = load_table(spark, sf_dir, "orders")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        p = pdf["o_totalprice"].to_numpy()
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(p)],
                "median_price": [float(np.median(p))],
                "min_price": [float(p.min())],
                "max_price": [float(p.max())],
            }
        )

    return groupby_apply(
        orders,
        ["o_custkey"],
        stats,
        "o_custkey long, n_orders long, median_price double, "
        "min_price double, max_price double",
    )


@query(
    "udf_frame_offsets",
    oracle="""
    SELECT event_id,
           CAST(value AS DOUBLE) AS duration,
           array_to_string(
             [CAST(floor(CAST(i AS DOUBLE) * CAST(value AS DOUBLE) * 1000.0 / 8.0) AS BIGINT)
              for i in generate_series(0, 7)], '|') AS frame_offsets_ms
    FROM events
    WHERE event_type = 'view'
    """,
)
def udf_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: 8 uniform millisecond offsets over a
    declared duration (events.value standing in for clip seconds).

    Offsets serialized '|'-joined at the query boundary (no ArrayType in
    driver-visible output per the result-schema policy)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    out = sample_frame_offsets(ev.withColumn("duration", F.col("value")), "value", 8)
    return out.select(
        "event_id",
        "duration",
        F.array_join(
            F.transform("frame_offsets_ms", lambda x: x.cast("string")), "|"
        ).alias("frame_offsets_ms"),
    )


@query("multimodal_decode_stub", oracle=None)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline with the deterministic fake decoder
    (real schema/batching/partitioning; codec stubbed — container has no
    image libs)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    return decode_image_meta(blobs, "blob", "doc_id", fake=True).orderBy("doc_id")
