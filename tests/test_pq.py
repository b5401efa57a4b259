"""Product quantization: codebook shape, encode determinism, ADC
self-retrieval, and shortlist+rerank recall vs exact L2."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.pq import (
    _sub_sq_dist,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    train_pq_codebooks,
)
from dask_ssh_docker_spark.sources import load_table

SF01 = "/root/testdata/sf0.01"
M, KS, DIM = 16, 16, 64


def _setup(spark):
    emb = load_table(spark, SF01, "embeddings")
    cb = train_pq_codebooks(emb, m=M, ks=KS, dim=DIM, iters=2)
    idx = pq_encode(emb, cb, m=M, dim=DIM)
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return emb, cb, idx, queries


def test_codebook_shape_and_encode_range(spark):
    emb, cb, idx, _ = _setup(spark)
    assert cb.count() == M * KS
    row = idx.first()
    assert len(row.codes) == M
    assert all(0 <= c < KS for c in row.codes)
    assert idx.count() == emb.count()


def test_adc_self_retrieval_rank1(spark):
    emb, cb, idx, queries = _setup(spark)
    got = pq_topk(queries, idx, cb, k=1, ks=KS, m=M, dim=DIM)
    top1 = {r.query_id: r.vec_id for r in got.collect()}
    assert top1 == {q: q for q in range(5)}


def test_shortlist_rerank_recall_vs_exact(spark):
    emb, cb, idx, queries = _setup(spark)
    got = pq_topk_rerank(
        queries, idx, cb, emb, k=10, expand=5, ks=KS, m=M, dim=DIM
    )
    pq_sets: dict = {}
    for r in got.collect():
        pq_sets.setdefault(r.query_id, set()).add(r.vec_id)
    exact = (
        queries.crossJoin(emb)
        .withColumn("d", _sub_sq_dist("query_vec", "embedding"))
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy("d", "vec_id")),
        )
        .filter("rank <= 10")
    )
    ex_sets: dict = {}
    for r in exact.collect():
        ex_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(pq_sets[q] & ex_sets[q]) / 10 for q in ex_sets]
    # measured ≈0.85 on this data (module docstring); generous floor
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_plan_no_python_eval(spark):
    emb, cb, idx, queries = _setup(spark)
    plan = (
        pq_topk(queries, idx, cb, k=10, ks=KS, m=M, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sf01_query_recall_vs_bruteforce(spark):
    # VERDICT r5 item 8: the registered PQ query pinned at sf0.1 against
    # the exact baseline.  The expand=20 shortlist holds recall as the
    # corpus grows (expand=5's fixed 50 candidates decayed to 0.58 here).
    from dask_ssh_docker_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.1"
    pq_rows = REGISTRY["sim_topk_pq"].fn(spark, sf).collect()
    bf_rows = REGISTRY["sim_topk_bruteforce"].fn(spark, sf).collect()
    pq_sets: dict = {}
    bf_sets: dict = {}
    for r in pq_rows:
        pq_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in bf_rows:
        bf_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(pq_sets.get(q, set()) & bf_sets[q]) / len(bf_sets[q]) for q in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_codebook_clamps_to_small_corpus(spark):
    # ADVICE r6: a corpus with fewer than ks vectors must train a smaller
    # codebook (ks' = corpus size), not index past the sample
    emb = load_table(spark, SF01, "embeddings").filter("vec_id < 5")
    cb = train_pq_codebooks(emb, m=M, ks=KS, dim=DIM, iters=1)
    assert cb.count() == M * 5
    idx = pq_encode(emb, cb, m=M, dim=DIM)
    assert idx.count() == 5
    assert all(0 <= c < 5 for c in idx.first().codes)


def test_codebook_empty_corpus_raises(spark):
    emb = load_table(spark, SF01, "embeddings").filter("vec_id < 0")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        train_pq_codebooks(emb, m=M, ks=KS, dim=DIM, iters=1)


def test_adc_stride_on_clamped_codebook(spark):
    # ADVICE r7: the ADC LUT fold indexed by the NOMINAL ks while the
    # trained codebook (and hence the LUT) was clamped to the corpus
    # size — reading wrong cells / nulls.  Stride now derives from
    # size(lut)/m.  Self-retrieval on a 5-vector corpus (ks'=5) is the
    # sharpest check: a mis-strided LUT cannot rank every query's own
    # vector first.
    emb = load_table(spark, SF01, "embeddings").filter("vec_id < 5")
    cb = train_pq_codebooks(emb, m=M, ks=KS, dim=DIM, iters=1)
    assert cb.count() == M * 5  # clamped: 5 < nominal ks=16
    idx = pq_encode(emb, cb, m=M, dim=DIM)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = pq_topk(queries, idx, cb, k=1, ks=KS, m=M, dim=DIM).collect()
    assert {r.query_id: r.vec_id for r in got} == {q: q for q in range(5)}
    assert all(r.approx_dist is not None for r in got)
