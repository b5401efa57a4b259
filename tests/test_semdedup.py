"""SemDeDup (operators/semdedup.py) and bloom anti-join
(operators/bloomjoin.py) pins.

The SemDeDup survivor set has no SQL oracle (k-means), so correctness is
pinned two ways: exact parity of the greedy prune against a naive
per-pair numpy reference run on the SAME cluster assignment, and the
algorithm's two invariants (survivors mutually below tau; every dropped
row condemned by a kept cluster-mate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.bloomjoin import bloom_anti_join
from dask_ssh_docker_spark.operators.semdedup import _greedy_semdedup, semdedup
from dask_ssh_docker_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
TAU = 0.95


@pytest.fixture(scope="module")
def verdict(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = semdedup(emb, "vec_id", "embedding", k=8, tau=TAU, iters=2).toPandas()
    vecs = emb.select("vec_id", "embedding").toPandas()
    return out, vecs


def _naive_greedy(U, order, tau):
    """Per-pair np.dot reference (no GEMM blocking)."""
    keep, max_sim = {}, {}
    kept = []
    for i in order:
        m = max((float(U[i] @ U[j]) for j in kept), default=-1.0)
        max_sim[i] = m
        if m < tau:
            keep[i] = True
            kept.append(i)
        else:
            keep[i] = False
    return keep, max_sim


def test_greedy_matches_naive_reference(verdict):
    out, vecs = verdict
    V = {int(r.vec_id): np.asarray(r.embedding, float) for r in vecs.itertuples()}
    for cid, grp in out.groupby("cluster_id"):
        ids = grp["vec_id"].to_numpy()
        X = np.stack([V[int(i)] for i in ids])
        n = np.linalg.norm(X, axis=1)
        U = X / np.where(n == 0, 1.0, n)[:, None]
        # recover the operator's scan order from its own outputs is not
        # possible (distances to the centroid aren't emitted), so rebuild
        # the order the same way: dist to the cluster MEAN is wrong — use
        # the blocked scanner itself as the cross-check subject instead:
        # any order must produce identical decisions between the blocked
        # and naive scanners.
        order = np.lexsort((ids, -n))  # arbitrary but fixed order
        k_blk, s_blk = _greedy_semdedup(U, order, TAU)
        k_ref, s_ref = _naive_greedy(U, order, TAU)
        for pos, row in enumerate(order):
            assert bool(k_blk[row]) == k_ref[row]
            assert abs(s_blk[row] - s_ref[row]) < 1e-9


def test_survivors_mutually_below_tau(verdict):
    out, vecs = verdict
    V = {int(r.vec_id): np.asarray(r.embedding, float) for r in vecs.itertuples()}
    for cid, grp in out.groupby("cluster_id"):
        kept = grp[grp["keep"]]["vec_id"].tolist()
        U = np.stack([V[int(i)] for i in kept])
        U = U / np.linalg.norm(U, axis=1)[:, None]
        S = U @ U.T
        np.fill_diagonal(S, -1.0)
        assert S.max() < TAU + 1e-9


def test_dropped_rows_have_kept_condemner(verdict):
    out, _ = verdict
    dropped = out[~out["keep"]]
    assert (dropped["max_sim"] >= TAU - 1e-9).all()
    # and every cluster keeps at least one row
    assert out.groupby("cluster_id")["keep"].any().all()


def test_exact_duplicates_are_dropped(spark):
    """Injected exact-duplicate vectors must be pruned with max_sim≈1."""
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)
    dups = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    out = semdedup(emb.unionByName(dups), "vec_id", "embedding", k=4, tau=TAU, iters=2)
    pdf = out.toPandas()
    assert len(pdf) == 200
    # of each (v, v+1e6) twin pair, exactly one survives
    pdf["orig"] = pdf["vec_id"] % 1_000_000
    per_twin = pdf.groupby("orig")["keep"].sum()
    assert (per_twin <= 1).all()
    assert pdf["keep"].sum() <= 100
    condemned = pdf[~pdf["keep"]]
    assert (condemned["max_sim"] > 0.999).all()


def test_bloom_anti_join_equals_plain_anti(spark):
    """Tiny bitmap (m_bits=256) forces false positives; the exact verify
    must clear them — result equals the plain left_anti bit-for-bit."""
    probe = spark.range(0, 500).select(
        F.col("id"), F.concat(F.lit("k"), (F.col("id") % 300).cast("string")).alias("k")
    )
    build = spark.range(0, 150).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("bk")
    )
    got = bloom_anti_join(probe, build, "k", "bk", m_bits=256).select("id", "k")
    want = probe.join(
        build.select(F.col("bk").alias("k")), "k", "left_anti"
    ).select("id", "k")
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w
    assert len(g) > 0


def test_corpus_overlap_minhash_tracks_exact(spark):
    """The H=128 MinHash estimate stays within 3·SE(≈0.13) + a small
    floor of the exact per-source-pair Jaccard on the sf0.001 corpus."""
    from dask_ssh_docker_spark.queries import REGISTRY

    exact = {
        (r.src_a, r.src_b): r.jaccard
        for r in REGISTRY["corpus_overlap_sources"].fn(spark, SF_DIR).collect()
    }
    est = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in REGISTRY["corpus_overlap_minhash"].fn(spark, SF_DIR).collect()
    }
    # the exact query emits only pairs sharing >=1 shingle; the estimator
    # emits every source pair (absent => exact jaccard 0)
    assert set(exact) <= set(est)
    worst = max(abs(est[k] - exact.get(k, 0.0)) for k in est)
    assert worst <= 0.15, f"minhash overlap estimate off by {worst}"


def test_semdedup_single_shuffle_after_assignment(spark):
    """The verdict frame's plan: Arrow assignment is map-side (no
    exchange) and the greedy prune costs exactly ONE shuffle — the
    cluster-id exchange into applyInPandas.  Vector bodies move once."""
    from dask_ssh_docker_spark.plans import count_exchanges

    emb = load_table(spark, SF_DIR, "embeddings")
    out = semdedup(emb, "vec_id", "embedding", k=4, tau=TAU, iters=1)
    assert count_exchanges(out) == 1


def test_corpus_overlap_plan_partitioned_windows_no_python(spark):
    """Overlap audit: every window is doc-partitioned (the lead() k-gram
    builder) — no global-order window, no Python eval anywhere."""
    from dask_ssh_docker_spark.plans import (
        unpartitioned_window_count,
        uses_python_eval,
    )
    from dask_ssh_docker_spark.queries import REGISTRY

    df = REGISTRY["corpus_overlap_sources"].fn(spark, SF_DIR)
    assert unpartitioned_window_count(df) == 0
    assert not uses_python_eval(df)


def test_word_shingles_exploded_short_fallback_modes(spark):
    """short_fallback=True emits the whole normalized text for docs
    shorter than k (the dedup-shingle/SQL-oracle convention);
    short_fallback=False emits nothing for them (the kgram convention)."""
    import pandas as pd

    from dask_ssh_docker_spark.functions.text import word_shingles_exploded

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "hi"]})
    )
    with_fb = word_shingles_exploded(df, "text", "doc_id", 3).collect()
    got = {(r.id, r.shingle) for r in with_fb}
    assert got == {(1, "a b c"), (1, "b c d"), (2, "hi")}
    no_fb = word_shingles_exploded(
        df, "text", "doc_id", 3, short_fallback=False
    ).collect()
    assert {(r.id, r.shingle) for r in no_fb} == {(1, "a b c"), (1, "b c d")}
