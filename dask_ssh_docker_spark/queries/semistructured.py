"""Semi-structured data surface: Spark 4 VARIANT type and the built-in
XML source/sink.

VARIANT is Spark 4's open-ended semi-structured type (``parse_json`` →
binary variant encoding, ``variant_get`` typed path extraction) — the
modern replacement for stringly-typed JSON columns: parsing happens once,
extraction is JVM-side on the binary encoding, and the column stays
schema-flexible.  DuckDB has no variant, but every query below surfaces
plain typed scalars, so the oracles express the same results through
DuckDB's JSON functions (or, for the construct→shred round trip, the
original columns themselves — JSON shortest-round-trip printing makes the
identity exact even for doubles).

The XML round trip follows the ``read_fwf_roundtrip`` pattern: render the
table to the format under test once per process (memoized temp dir), read
it back with an explicit schema, and let the oracle prove value identity
against the parquet source.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, read_xml, write_xml
from .registry import query


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_id,
           json(props)::VARCHAR                                   AS props_min,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_num,
           json_extract_string(props, '$.k')                      AS k_str,
           TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
                                                                  AS missing_num
    FROM events
    WHERE event_id < 1000
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``props`` JSON → VARIANT once, then typed path extraction
    (``variant_get``) and minified re-serialization (``to_json``) — all
    JVM-side on the binary variant encoding; missing paths surface as
    NULL, matching DuckDB's json_extract semantics."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.to_json(v).alias("props_min"),
        F.try_variant_get(v, "$.k", "bigint").alias("k_num"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_num"),
    )


@query(
    "variant_shred_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars, text AS text_rt
    FROM documents
    WHERE doc_id % 7 = 0
    """,
)
def variant_shred_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construct nested JSON from typed columns → parse to VARIANT →
    shred typed values back out of nested paths.  The oracle selects the
    *original* columns: equality proves the construct→parse→extract
    pipeline is lossless, including JSON escaping of arbitrary document
    text and exact round-tripping of integers through the variant
    encoding."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    j = F.to_json(
        F.struct(
            F.col("lang").alias("l"),
            F.struct(
                F.col("text").alias("t"), F.col("n_chars").alias("n")
            ).alias("meta"),
        )
    )
    v = F.parse_json(j)
    return docs.select(
        "doc_id",
        F.try_variant_get(v, "$.l", "string").alias("lang"),
        F.try_variant_get(v, "$.meta.n", "bigint").alias("n_chars"),
        F.try_variant_get(v, "$.meta.t", "string").alias("text_rt"),
    )


# rendered XML dir per sf_dir (same memoization rationale as read_fwf_roundtrip)
_XML_RENDER_CACHE: dict[str, str] = {}


@query(
    "read_xml_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
)
def read_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink end-to-end (§2.B): events rendered to XML
    (values escaped), read back with an explicit schema, proven
    value-identical to the parquet source by the oracle."""
    path = _XML_RENDER_CACHE.get(sf_dir)
    if path is None:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type"
        )
        path = tempfile.mkdtemp(prefix="spark_graft_xml_") + "/data"
        write_xml(ev, path, row_tag="event", root_tag="events")
        _XML_RENDER_CACHE[sf_dir] = path
    return read_xml(
        spark,
        path,
        row_tag="event",
        schema="event_id bigint, user_id bigint, event_type string",
    )
