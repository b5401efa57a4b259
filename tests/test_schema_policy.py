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
