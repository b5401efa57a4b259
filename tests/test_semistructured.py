"""Tests for the VARIANT surface and the XML source/sink round trip."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dask_ssh_docker_spark.sources import read_xml, write_xml


TRICKY = [
    (1, 'quotes " and \\ backslash'),
    (2, "newline\nand\ttab"),
    (3, "unicode: héllo — 中文 🚀"),
    (4, ""),
    (5, "xml specials: <tag> & 'quote'"),
    (6, None),
]


def test_variant_string_roundtrip_lossless(spark):
    df = spark.createDataFrame(TRICKY, ["id", "s"])
    v = F.parse_json(F.to_json(F.struct(F.col("s").alias("x"))))
    out = df.select(
        "id", F.try_variant_get(v, "$.x", "string").alias("rt")
    ).collect()
    want = dict(TRICKY)
    for r in out:
        assert r.rt == want[r.id], (r.id, r.rt)


def test_variant_typed_extraction_and_missing(spark):
    df = spark.createDataFrame([('{"a": {"b": [1, 2.5, "x"]}}',)], ["j"])
    v = F.parse_json("j")
    row = df.select(
        F.try_variant_get(v, "$.a.b[0]", "bigint").alias("i"),
        F.try_variant_get(v, "$.a.b[1]", "double").alias("d"),
        F.try_variant_get(v, "$.a.b[2]", "string").alias("s"),
        F.try_variant_get(v, "$.a.missing", "bigint").alias("m"),
        F.schema_of_variant(v).alias("sch"),
    ).collect()[0]
    assert (row.i, row.d, row.s, row.m) == (1, 2.5, "x", None)
    assert "OBJECT" in row.sch


def test_xml_roundtrip_escaping(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in TRICKY if s is not None], ["id", "s"]
    )
    path = tempfile.mkdtemp(prefix="xml_rt_") + "/data"
    write_xml(df, path, row_tag="r", root_tag="rs")
    back = read_xml(spark, path, row_tag="r", schema="id bigint, s string")
    got = {r.id: r.s for r in back.collect()}
    want = {i: s for i, s in TRICKY if s is not None}
    # XML cannot represent an empty element distinguishably from NULL for
    # string columns in all readers; accept '' → None fold for id=4 only.
    assert got.pop(4, None) in ("", None)
    want.pop(4)
    assert got == want
