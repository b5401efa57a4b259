"""MERGE-INTO upsert + SCD Type-2 operator semantics (operators/cdc.py)
and the triangle-count graph query, pinned on hand-built inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.cdc import merge_upsert, scd2_from_changelog


def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="old1", x=10), Row(k=2, v="old2", x=20)]
    )
    source = spark.createDataFrame(
        [Row(k=2, v="new2", x=None), Row(k=3, v="new3", x=30)],
        schema="k bigint, v string, x bigint",
    )
    out = {r["k"]: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert set(out) == {1, 2, 3}
    # unmatched target passes through
    assert out[1]["v"] == "old1" and out[1]["x"] == 10
    # matched: whole source row wins, INCLUDING its NULLs (UPDATE SET *)
    assert out[2]["v"] == "new2" and out[2]["x"] is None
    # unmatched source inserts
    assert out[3]["v"] == "new3" and out[3]["x"] == 30


def test_merge_upsert_rejects_schema_mismatch(spark):
    target = spark.createDataFrame([Row(k=1, v="a")])
    source = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, source, ["k"])


def test_scd2_intervals_chain_per_key(spark):
    changes = spark.createDataFrame(
        [
            Row(k=1, ts=10, attr="a"),
            Row(k=1, ts=20, attr="b"),
            Row(k=1, ts=30, attr="c"),
            Row(k=2, ts=15, attr="z"),
        ]
    )
    out = scd2_from_changelog(changes, key="k", ts_col="ts").collect()
    rows = {(r["k"], r["ts"]): r for r in out}
    # intervals chain: valid_to of one version = valid_from of the next
    assert rows[(1, 10)]["valid_to"] == 20 and not rows[(1, 10)]["is_current"]
    assert rows[(1, 20)]["valid_to"] == 30 and not rows[(1, 20)]["is_current"]
    assert rows[(1, 30)]["valid_to"] is None and rows[(1, 30)]["is_current"]
    # singleton key: sole version is current
    assert rows[(2, 15)]["valid_to"] is None and rows[(2, 15)]["is_current"]


def test_scd2_tie_break_via_order_extra(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=10, seq=2, attr="late"), Row(k=1, ts=10, seq=1, attr="early")]
    )
    out = scd2_from_changelog(changes, key="k", ts_col="ts", order_extra=("seq",))
    rows = {r["seq"]: r for r in out.collect()}
    assert not rows[1]["is_current"] and rows[2]["is_current"]


def test_triangle_count_known_graph(spark):
    # K4 on {0,1,2,3} plus a pendant edge 3-4: every K4 node sits in 3
    # triangles, node 4 in none.
    from dask_ssh_docker_spark.queries.graph_analytics import triangle_count_trade

    edges = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 4)]
    ud = spark.createDataFrame(edges, "a bigint, b bigint")
    e1, e2, e3 = ud.alias("e1"), ud.alias("e2"), ud.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")))
        .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    )
    triangles = {tuple(r) for r in tri.collect()}
    assert triangles == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .count()
        .collect()
    )
    counts = {r["node"]: r["count"] for r in per_node}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}
    assert triangle_count_trade is not None  # query registered


def test_snapshot_diff_tags_and_roundtrip(spark):
    from dask_ssh_docker_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"), Row(k=5, v=None)]
    )
    new = spark.createDataFrame(
        [Row(k=2, v="b"), Row(k=3, v="C"), Row(k=4, v="d"), Row(k=5, v=None)]
    )
    diff = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert diff == {
        1: "delete",
        2: "unchanged",
        3: "update",
        4: "insert",
        5: "unchanged",  # NULL == NULL under null-safe compare
    }
    # inverse property: old + (inserts/updates from new) - deletes == new
    changed_keys = [k for k, t in diff.items() if t in ("insert", "update")]
    src = new.filter(F.col("k").isin(changed_keys))
    merged = merge_upsert(old, src, ["k"]).filter(
        ~F.col("k").isin([k for k, t in diff.items() if t == "delete"])
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in new.collect()}
