"""Pins for the wave-5 operators: two-sample tests, drift/anomaly audits,
feature encoders, Brown smoothing, and MMR re-ranking.

The oracle gate (tools/check_oracle.py) already value-hashes the eight
SQL-expressible queries against DuckDB; these tests pin the *semantics*
(parity with an independent Python implementation, plus invariants the
hash can't see) and the rows-only MMR path.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


def _rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------------------
# KS / Mann-Whitney
# ---------------------------------------------------------------------------


def test_ks_matches_numpy_reference(spark, sf_dir):
    from dask_ssh_docker_spark.queries.stats_tests import (
        _KS_BIN_W,
        ks_binned_click_view,
    )
    from dask_ssh_docker_spark.sources import load_table

    got = _rows(ks_binned_click_view(spark, sf_dir))[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pdf = ev.filter(ev.event_type.isin("click", "view")).toPandas()
    a = np.floor(pdf[pdf.event_type == "click"].value.to_numpy() / _KS_BIN_W)
    b = np.floor(pdf[pdf.event_type == "view"].value.to_numpy() / _KS_BIN_W)
    bins = np.arange(0, max(a.max(), b.max()) + 2)
    ca = np.cumsum(np.histogram(a, bins=bins)[0]) / len(a)
    cb = np.cumsum(np.histogram(b, bins=bins)[0]) / len(b)
    want = float(np.max(np.abs(ca - cb)))
    assert got["n_click"] == len(a) and got["n_view"] == len(b)
    assert got["ks_d"] == pytest.approx(want, abs=1e-6)
    assert 0.0 <= got["ks_d"] <= 1.0


def test_mannwhitney_matches_rank_reference(spark, sf_dir):
    from dask_ssh_docker_spark.queries.stats_tests import (
        mannwhitney_click_view,
    )
    from dask_ssh_docker_spark.sources import load_table

    got = _rows(mannwhitney_click_view(spark, sf_dir))[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pdf = ev.filter(ev.event_type.isin("click", "view")).toPandas()
    a = pdf[pdf.event_type == "click"].value.to_numpy()
    b = pdf[pdf.event_type == "view"].value.to_numpy()
    # independent reference: U from average ranks of the pooled sample
    pooled = np.concatenate([a, b])
    order = pooled.argsort(kind="mergesort")
    ranks = np.empty(len(pooled))
    # average ranks for ties
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    u_a = float(ranks[: len(a)].sum() - len(a) * (len(a) + 1) / 2.0)
    assert got["u_click"] == pytest.approx(u_a, abs=1e-9)
    # z-score: symmetric-ish samples → |z| well below 10; sign matches
    # the direction of the mean-rank difference
    assert abs(got["z_score"]) < 10.0
    mu = len(a) * len(b) / 2.0
    if u_a > mu:
        assert got["z_score"] > 0
    elif u_a < mu:
        assert got["z_score"] < 0


# ---------------------------------------------------------------------------
# PSI / Benford
# ---------------------------------------------------------------------------


def test_psi_terms_and_counts(spark, sf_dir):
    from dask_ssh_docker_spark.queries.stats_tests import psi_price_drift
    from dask_ssh_docker_spark.sources import load_table

    rows = _rows(psi_price_drift(spark, sf_dir))
    orders_n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_early"] + r["n_late"] for r in rows) == orders_n
    assert all(0 <= r["bin"] <= 9 for r in rows)
    # PSI term sign follows p-q: (p-q)ln(p/q) >= 0 always
    assert all(r["psi_term"] >= 0 for r in rows)


def test_benford_expected_follows_log_law(spark, sf_dir):
    from dask_ssh_docker_spark.queries.stats_tests import (
        benford_price_digits,
    )
    from dask_ssh_docker_spark.sources import load_table

    rows = _rows(benford_price_digits(spark, sf_dir))
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_obs"] for r in rows) == n
    for r in rows:
        assert 1 <= r["digit"] <= 9
        want = n * math.log10(1.0 + 1.0 / r["digit"])
        assert r["n_expected"] == pytest.approx(want, abs=1e-3)
    # expectations integrate to n (Benford probabilities sum to 1 over 1..9)
    assert sum(
        n * math.log10(1.0 + 1.0 / d) for d in range(1, 10)
    ) == pytest.approx(n, rel=1e-12)


# ---------------------------------------------------------------------------
# Feature encoders
# ---------------------------------------------------------------------------


def test_target_encode_loo_matches_pandas(spark, sf_dir):
    from dask_ssh_docker_spark.queries.mlprep import target_encode_loo
    from dask_ssh_docker_spark.sources import load_table

    got = {
        r["o_orderkey"]: r["loo_enc"]
        for r in _rows(target_encode_loo(spark, sf_dir))
    }
    pdf = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .toPandas()
    )
    g = pdf.groupby("o_orderpriority").o_totalprice
    s = g.transform("sum")
    c = g.transform("count")
    want = (s - pdf.o_totalprice) / (c - 1)
    for k, w in zip(pdf.o_orderkey, want):
        assert got[k] == pytest.approx(w, abs=1e-4)


def test_feature_hash_bucket_range_and_mass(spark, sf_dir):
    from dask_ssh_docker_spark.queries.mlprep import feature_hash_signed
    from dask_ssh_docker_spark.sources import load_table

    rows = _rows(feature_hash_signed(spark, sf_dir))
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_feats"] for r in rows) == 2 * n  # two features per row
    for r in rows:
        assert 0 <= r["bucket"] < 32
        assert abs(r["weight_sum"]) <= r["n_feats"]
        # every row of one feature value hashes identically → each
        # bucket's mass is ±its load or a mix of full feature groups
        assert (r["weight_sum"] - r["n_feats"]) % 2 == 0


def test_decayed_activity_bounds(spark, sf_dir):
    from dask_ssh_docker_spark.queries.mlprep import decayed_user_activity

    rows = _rows(decayed_user_activity(spark, sf_dir))
    for r in rows:
        # each event weighs in (0, 1] → decayed count within (0, n]
        assert 0 < r["decayed_count"] <= r["n_events"]
        assert r["decayed_value"] >= 0


# ---------------------------------------------------------------------------
# Brown double exponential smoothing
# ---------------------------------------------------------------------------


def test_holt_brown_matches_python_fold(spark, sf_dir):
    from dask_ssh_docker_spark.queries.mlprep import (
        _H_DECAY,
        _H_FRAME,
        _H_ONE_MINUS,
        holt_brown_forecast,
    )
    from dask_ssh_docker_spark.sources import load_table
    from pyspark.sql import functions as F

    got = _rows(holt_brown_forecast(spark, sf_dir))
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(8,2)")).cast("double").alias("y"))
        .toPandas()
        .sort_values(["user_id", "day"])
    )

    def ewma(vals):
        acc = 0.0
        for x in vals:
            acc = acc * _H_DECAY + x
        den = (1 - _H_DECAY ** len(vals)) / _H_ONE_MINUS
        return acc / den

    want = {}
    for uid, grp in daily.groupby("user_id"):
        ys = grp.y.tolist()
        days = grp.day.tolist()
        s1s = []
        for i in range(len(ys)):
            lo = max(0, i - (_H_FRAME - 1))
            s1s.append(ewma(ys[lo : i + 1]))
        for i in range(len(ys)):
            lo = max(0, i - (_H_FRAME - 1))
            s1, s2 = s1s[i], ewma(s1s[lo : i + 1])
            level = 2 * s1 - s2
            trend = (1 - _H_DECAY) / _H_DECAY * (s1 - s2)
            want[(uid, days[i])] = (level, trend, level + trend)
    assert len(got) == len(want)
    for r in got:
        # boundary type is timestamp (schema policy); reference keys are dates
        lv, tr, fc = want[(r["user_id"], r["day"].date())]
        assert r["level_smooth"] == pytest.approx(lv, abs=1e-5)
        assert r["trend_smooth"] == pytest.approx(tr, abs=1e-5)
        assert r["forecast_next"] == pytest.approx(fc, abs=1e-5)


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------


def _mmr_reference(qvec, cand_ids, cand_vecs, rel, k, lam):
    vn = cand_vecs / np.maximum(
        np.linalg.norm(cand_vecs, axis=1, keepdims=True), 1e-300
    )
    sims = vn @ vn.T
    selected, remaining, out = [], list(range(len(cand_ids))), []
    for rank in range(1, k + 1):
        if selected:
            scores = lam * rel - (1 - lam) * sims[:, selected].max(axis=1)
        else:
            scores = rel.copy()
        best = min(remaining, key=lambda i: (-scores[i], cand_ids[i]))
        out.append((rank, int(cand_ids[best]), float(scores[best])))
        selected.append(best)
        remaining.remove(best)
    return out


def test_mmr_parity_with_reference(spark, sf_dir):
    from dask_ssh_docker_spark.operators.similarity import brute_force_topk
    from dask_ssh_docker_spark.queries.similarity import sim_mmr_rerank
    from dask_ssh_docker_spark.sources import load_table
    from pyspark.sql import functions as F

    got = _rows(sim_mmr_rerank(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select("vec_id", "embedding")
    cands = brute_force_topk(qdf, corpus, k=20).toPandas()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.collect()
    }
    qvecs = {r["query_id"]: r["embedding"] for r in qdf.collect()}
    by_q = {}
    for qid, grp in cands.groupby("query_id"):
        grp = grp.sort_values(["sim", "vec_id"], ascending=[False, True])
        ids = grp.vec_id.to_numpy()
        want = _mmr_reference(
            qvecs[qid],
            ids,
            np.array([vecs[i] for i in ids]),
            grp["sim"].to_numpy(dtype=np.float64),
            k=5,
            lam=0.7,
        )
        by_q[qid] = want
    assert len(got) == 3 * 5
    for r in got:
        rank, vid, score = by_q[r["query_id"]][r["rank"] - 1]
        assert r["vec_id"] == vid, (r, by_q[r["query_id"]])
        assert r["mmr_score"] == pytest.approx(score, abs=1e-5)


def test_mmr_rank1_is_top_relevance_and_diversity_tradeoff(spark, sf_dir):
    from dask_ssh_docker_spark.queries.similarity import sim_mmr_rerank

    got = _rows(sim_mmr_rerank(spark, sf_dir))
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        # rank 1 is pure relevance: its mmr_score equals its relevance
        assert rows[0]["mmr_score"] == pytest.approx(
            rows[0]["relevance"], abs=1e-6
        )
        # subsequent picks: score = λ·rel − (1−λ)·max_sim with
        # max_sim ∈ [−1, 1] → |score − λ·rel| ≤ (1−λ)
        for r in rows[1:]:
            assert abs(r["mmr_score"] - 0.7 * r["relevance"]) <= 0.3 + 1e-9
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert len({r["vec_id"] for r in rows}) == 5
