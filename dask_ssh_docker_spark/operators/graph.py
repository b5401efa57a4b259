"""Graph utilities: connected components over an edge DataFrame.

The min-label propagation loop lives in ``operators/dedup.py``
(``cluster_min_label``) where the near-dup pipelines use it; this module
is the public, domain-neutral entry point for users who bring their own
edge list (co-occurrence graphs, entity resolution, lineage closure).

Scale shape: one edge-set shuffle per round, eager ``localCheckpoint``
lineage cuts, convergence early-exit, strict cap on rounds (components
wider than the cap raise instead of silently splitting).  Correctness is
driver-checked end-to-end via ``dedup_clusters_transitive`` (DuckDB
recursive-CTE fixpoint oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cluster_min_label


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
    strict: bool = True,
) -> DataFrame:
    """(node, component): weakly connected components of the undirected
    graph, component label = minimum member id.

    ``edges`` needs columns ``src``/``dst`` (rename via the params).
    ``nodes`` (one ``id`` column) adds isolated vertices; when omitted,
    the node set is derived from the edge endpoints (isolated vertices
    cannot be known from edges alone).
    """
    pairs = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    if nodes is None:
        nodes = (
            pairs.select(F.col("id_a").alias("id"))
            .union(pairs.select(F.col("id_b").alias("id")))
            .distinct()
        )
    out = cluster_min_label(pairs, nodes, cc_iters=max_iters, strict=strict)
    return out.select(F.col("id").alias("node"), F.col("cluster_id").alias("component"))
