"""MapType functions (SURVEY.md §2.G map/json row — the dict-in-object-
column surface): ``from_json`` to ``MapType`` + map accessors.

The oracle expresses the same results through DuckDB's JSON functions
(DuckDB's ``element_at`` on maps returns a list, not a scalar — different
shape, so the oracle stays on json_extract which matches Spark's scalar
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import load_table
from .registry import query


@query(
    "map_functions_props",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           array_to_string(list_sort(CAST(json_keys(props) AS VARCHAR[])), '|')
                                                             AS prop_keys,
           len(json_keys(props))                             AS n_props,
           json_extract(props, '$.k') IS NOT NULL            AS has_k,
           json_extract(props, '$.missing') IS NOT NULL     AS has_missing
    FROM events
    WHERE event_id < 500
    """,
)
def map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``props`` JSON → ``MapType(string, long)`` → map accessors
    (map_keys / element_at / size / map_contains_key)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("prop_keys"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_props"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.map_contains_key(m, "missing").alias("has_missing"),
    )
