"""Result-schema policy sweep (regression guard for the driver gate).

The external correctness harness canonicalizes query output through pandas
(sort + hash); column types that don't survive that trip cleanly are
banned from driver-visible output:

- ARRAY/MAP/STRUCT: pandas sort_values raises on unhashable cells (the
  round-1 red row) — serialize with array_join/to_json at the boundary;
- DECIMAL: pandas converts to object/Decimal, hashing diverges from the
  oracle's float path — cast to double after exact aggregation;
- DATE: date-vs-midnight-timestamp normalization differs between engines'
  pandas conversions — cast to timestamp.

BINARY is allowed (bytes hash fine and round-trip exactly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

_BANNED = (T.ArrayType, T.MapType, T.StructType, T.DecimalType, T.DateType)


def test_no_driver_hostile_output_types(spark):
    from dask_ssh_docker_spark.queries import REGISTRY

    offenders = []
    for name, spec in REGISTRY.items():
        if spec.fn.__module__.endswith("queries.streaming"):
            continue  # streaming queries execute eagerly on construction
        df = spec.fn(spark, SF)
        for f in df.schema.fields:
            if isinstance(f.dataType, _BANNED):
                offenders.append((name, f.name, str(f.dataType)))
    assert not offenders, (
        "driver-visible output columns with banned types (serialize at the "
        f"query boundary): {offenders}"
    )


def test_documents_doc_id_unique(spark, sf_dir):
    """Testdata contract pin (ADVICE r10): text_tfidf_top_terms' df
    derivation rewrites COUNT(DISTINCT doc_id) as a plain count over the
    (doc_id, doc_len, term) pre-aggregate — equivalent ONLY while doc_id
    is unique in documents (a duplicate doc_id with different text would
    contribute two rows per (doc_id, term) and over-count df).  Assert
    the uniqueness so a corpus that breaks the contract fails loudly
    here instead of hash-mismatching downstream."""
    from dask_ssh_docker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    total, distinct = docs.selectExpr(
        "count(*) AS n", "count(DISTINCT doc_id) AS d"
    ).first()
    assert total == distinct, f"documents.doc_id not unique: {total} vs {distinct}"


def test_footer_schema_matches_spark_inference(spark):
    """Pin for the r13 footer-schema fast path (sources.load_table):
    ``parquet_footer_schema`` must return EXACTLY the StructType Spark's
    own inference produces — full equality, nullability and nested types
    included — for every driver table at every validation SF, plus take
    the fast path (non-None) so load_table actually skips the 1-task
    inference job.  ``events`` is checked under the same confs
    load_table sets before reading it."""
    import os

    from dask_ssh_docker_spark.sources import TABLES, parquet_footer_schema

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for name in TABLES:
            path = f"/root/testdata/{sf}/{name}.parquet"
            if not os.path.isfile(path):
                continue
            if name == "events":
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                spark.conf.set("spark.sql.session.timeZone", "UTC")
            mine = parquet_footer_schema(spark, path)
            assert mine is not None, f"fast path not taken for {path}"
            inferred = spark.read.parquet(path).schema
            assert mine == inferred, (
                f"footer schema diverges from Spark inference for {path}:\n"
                f"  footer:   {mine}\n  inferred: {inferred}"
            )


def test_footer_schema_fallbacks(spark, tmp_path):
    """The fast path must refuse (return None) whenever fidelity is not
    provable: missing file, directory dataset, and TIMESTAMP(NANOS)
    without the nanosAsLong conf."""
    from dask_ssh_docker_spark.sources import parquet_footer_schema

    assert parquet_footer_schema(spark, str(tmp_path / "nope.parquet")) is None
    d = tmp_path / "dataset.parquet"
    d.mkdir()
    assert parquet_footer_schema(spark, str(d)) is None

    import pyarrow as pa
    import pyarrow.parquet as papq

    ns_file = str(tmp_path / "ns.parquet")
    papq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))}),
        ns_file,
        coerce_timestamps=None,
        store_schema=False,
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        assert parquet_footer_schema(spark, ns_file) is None
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        got = parquet_footer_schema(spark, ns_file)
        assert got is not None and got["ts"].dataType.simpleString() == "bigint"
        assert got == spark.read.parquet(ns_file).schema
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
