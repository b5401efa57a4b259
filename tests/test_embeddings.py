"""Embedding reductions: the Arrow-vectorized centroid scale path must
agree with the posexplode oracle formulation, and its Python crossing
must be Arrow-batched (no row-at-a-time eval)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_mapinpandas_centroids_match_posexplode(spark):
    from dask_ssh_docker_spark.operators.embeddings import centroids_by_label
    from dask_ssh_docker_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    fast = {
        r["label"]: (r["centroid"], r["n_vectors"])
        for r in centroids_by_label(emb).collect()
    }

    # reference: exploded exact means
    ref_rows = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.sum(F.col("v").cast("double")) / F.count("*")).alias("mv"))
        .collect()
    )
    ref: dict[int, dict[int, float]] = {}
    for r in ref_rows:
        ref.setdefault(r["label"], {})[r["pos"]] = r["mv"]

    assert set(fast) == set(ref)
    for lbl, (centroid, n) in fast.items():
        assert n > 0
        want = [ref[lbl][i] for i in range(len(centroid))]
        for got, exp in zip(centroid, want):
            assert math.isclose(got, exp, rel_tol=1e-9, abs_tol=1e-12), (
                lbl,
                got,
                exp,
            )


def test_centroid_partials_shrink_shuffle(spark):
    """The mapInPandas path must shuffle O(labels×partitions) partial
    rows, not rows×dim cells: assert the plan has no posexplode/Generate
    and exactly one exchange (the final label combine)."""
    from dask_ssh_docker_spark.operators.embeddings import centroids_by_label
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan
    from dask_ssh_docker_spark.sources import load_table

    df = centroids_by_label(load_table(spark, SF, "embeddings"))
    plan = physical_plan(df)
    assert "Generate" not in plan  # no explode anywhere
    assert count_exchanges(df) == 1
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
