"""Prefix-filtered set-similarity join: lossless vs the all-pairs exact
baseline (the registered query additionally hash-matches the DuckDB
all-pairs oracle at sf0.01)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return set(map(tuple, df.select("id_a", "id_b").toPandas().values.tolist()))


def test_prefix_equals_allpairs_on_corpus(spark):
    from dask_ssh_docker_spark.operators.dedup import jaccard_pairs_exact
    from dask_ssh_docker_spark.operators.setsim import setsim_pairs_prefix
    from dask_ssh_docker_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    base = jaccard_pairs_exact(docs, "text", "doc_id", threshold=0.35)
    pre = setsim_pairs_prefix(docs, "text", "doc_id", t_num=7, t_den=20)
    bp, pp = base.toPandas(), pre.toPandas()
    assert _pairs(base) == _pairs(pre)
    # jaccard values identical too, not just membership
    bj = {(r.id_a, r.id_b): r.jaccard for r in bp.itertuples()}
    pj = {(r.id_a, r.id_b): r.jaccard for r in pp.itertuples()}
    assert bj == pj


def test_prefix_lossless_boundary_cases(spark):
    """Adversarial corpus: exact-threshold pairs (J == t precisely),
    just-below-threshold pairs, identical docs, and size-ratio edge
    cases — prefix filtering must lose nothing the baseline finds."""
    from dask_ssh_docker_spark.operators.dedup import jaccard_pairs_exact
    from dask_ssh_docker_spark.operators.setsim import setsim_pairs_prefix

    # Docs built from word 3-shingles: a doc of k+2 words has k shingles.
    w = [f"w{i}" for i in range(40)]
    mk = lambda idx: " ".join(w[i] for i in idx)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(1, 8)),
                "text": [
                    mk(range(0, 12)),        # 1: shingles 0..9
                    mk(range(0, 12)),        # 2: identical to 1 (J=1)
                    mk(range(0, 10)),        # 3: prefix-subset of 1
                    mk(range(2, 14)),        # 4: overlaps 1 heavily
                    mk(range(20, 32)),       # 5: disjoint from 1-4
                    mk(range(20, 30)),       # 6: overlaps 5
                    mk(range(30, 40)),       # 7: tail overlap with 5
                ],
            }
        )
    )
    for t_num, t_den in [(1, 2), (7, 20), (3, 5), (9, 10)]:
        base = jaccard_pairs_exact(
            docs, "text", "doc_id", threshold=t_num / t_den
        )
        pre = setsim_pairs_prefix(docs, "text", "doc_id", t_num=t_num, t_den=t_den)
        assert _pairs(base) == _pairs(pre), (t_num, t_den)


def test_prefix_plan_has_no_python_eval(spark):
    from dask_ssh_docker_spark.operators.setsim import setsim_pairs_prefix
    from dask_ssh_docker_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    plan = (
        setsim_pairs_prefix(docs, "text", "doc_id", t_num=7, t_den=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
