#!/usr/bin/env python
"""Persisted-index fit-once/probe-many ACROSS sessions (VERDICT r11
item 4).  ``tools/ivfpq_split_probe.py`` measured the split within one
session; this tool measures the cross-session contract the new
``operators/ann_index.py`` save/load API enables:

  phase 1 (this process): train + encode + ``save_ivfpq_index`` — timed.
  phase 2 (a FRESH subprocess JVM): ``load_ivfpq_index`` + N probe
  batches — timed separately, so the probe wall includes everything a
  new session actually pays (session start excluded, load + probe
  included) and none of the fit.

Usage:  python tools/ann_index_probe.py [sf_dir] [n_batches]
        python tools/ann_index_probe.py --probe <index_path> <sf_dir> <n>
        python tools/ann_index_probe.py --grown [sf_dir] [n_batches]

``--grown`` (VERDICT r12 item 7): the corpus-growth lifecycle — fit on
half, ``append_ivfpq_index`` the rest against the stale centroids, and
report recall@10 (stale-grown vs fresh-fit vs exact), the
``refit_recommended`` decision at 2×/4×, and fresh-session probe
latency on the grown index.
Prints ONE JSON line (the --probe child prints its own, consumed by the
parent).  Default sf_dir: /root/repo/testdata_sf1/sf1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _queries(emb, b):
    from pyspark.sql import functions as F

    return emb.filter(
        (F.col("vec_id") >= 5 * b) & (F.col("vec_id") < 5 * (b + 1))
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def probe_main(index_path: str, sf_dir: str, n_batches: int) -> None:
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.ann_index import (
        ivfpq_probe,
        load_ivfpq_index,
    )
    from dask_ssh_docker_spark.session import get_session
    from dask_ssh_docker_spark.sources import load_table

    spark = get_session("ann-index-probe")
    t0 = time.perf_counter()
    idx = load_ivfpq_index(spark, index_path)
    load_wall = round(time.perf_counter() - t0, 3)
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5 * n_batches).select(
        "vec_id", "embedding"
    )
    walls = []
    for b in range(n_batches):
        t0 = time.perf_counter()
        out = ivfpq_probe(
            _queries(emb, b), idx, corpus=corpus, k=10, nprobe=12, expand=20
        )
        assert out.count() > 0
        walls.append(round(time.perf_counter() - t0, 3))
    print(
        "PROBE_JSON "
        + json.dumps({"load_wall_s": load_wall, "probe_batch_walls_s": walls})
    )


def _recall_at_k(approx_df, gt: dict, k: int, query_id="query_id", id_col="vec_id"):
    """Mean |approx ∩ exact| / k over queries; gt: {qid: set(ids)}."""
    hits: dict = {}
    for r in approx_df.select(query_id, id_col).collect():
        if r[id_col] in gt[r[query_id]]:
            hits[r[query_id]] = hits.get(r[query_id], 0) + 1
    return round(sum(hits.get(q, 0) for q in gt) / (len(gt) * k), 4)


def grown_main(sf_dir: str, n_batches: int) -> None:
    """VERDICT r12 item 7 — the append path: fit on HALF the corpus,
    ``append_ivfpq_index`` the other half (stale centroids), then measure
    (a) recall@10 of the stale-grown index vs exact ground truth, (b) the
    same recall for a FRESH fit on the full corpus (the staleness cost is
    the delta), (c) the ``refit_recommended`` decision at 2× growth, and
    (d) fresh-subprocess load+probe latency on the grown index."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.ann_index import (
        append_ivfpq_index,
        ivfpq_probe,
        refit_recommended,
        save_ivfpq_index,
    )
    from dask_ssh_docker_spark.operators.ivfpq import (
        coarse_k_for,
        encode_ivfpq,
        ivfpq_topk,
        train_ivfpq,
    )
    from dask_ssh_docker_spark.session import get_session
    from dask_ssh_docker_spark.sources import load_table

    k, nprobe = 10, 12
    index_path = os.environ.get(
        "ANN_INDEX_PATH", "/tmp/ann_index_probe/ivfpq_grown"
    )
    spark = get_session("ann-index-grown")
    emb = load_table(spark, sf_dir, "embeddings")
    import pyarrow.parquet as papq

    n = papq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    q_hi = 5 * n_batches
    cutoff = q_hi + (n - q_hi) // 2
    corpus = emb.filter(F.col("vec_id") >= q_hi).select("vec_id", "embedding")
    old = corpus.filter(F.col("vec_id") < cutoff)
    n_old, n_now = cutoff - q_hi, n - q_hi

    k_old = coarse_k_for(n_old)
    t0 = time.perf_counter()
    cents, cb = train_ivfpq(old, k_coarse=k_old, coarse_iters=2, m=16, ks=16, dim=64)
    cb = cb.localCheckpoint(eager=True)
    save_ivfpq_index(
        index_path, cents, cb, encode_ivfpq(old, cents, cb, m=16, dim=64),
        m=16, dim=64, k_coarse=k_old, fitted_rows=n_old,
    )
    fit_wall = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    grown = append_ivfpq_index(
        spark, index_path, corpus.filter(F.col("vec_id") >= cutoff)
    )
    append_wall = round(time.perf_counter() - t0, 3)

    # exact L2 ground truth (driver numpy — a measurement tool, not an op)
    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    queries = emb.filter(F.col("vec_id") < q_hi).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    gt = {}
    for r in queries.collect():
        d = ((X - np.asarray(r["query_vec"], dtype=np.float64)) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:k]
        gt[r["query_id"]] = set(ids[order].tolist())

    stale = ivfpq_probe(queries, grown, corpus=corpus, k=k, nprobe=nprobe)
    recall_stale = _recall_at_k(stale, gt, k)

    def fresh_recall(k_fit: int) -> float:
        cents_f, cb_f = train_ivfpq(
            corpus, k_coarse=k_fit, coarse_iters=2, m=16, ks=16, dim=64
        )
        cb_f = cb_f.localCheckpoint(eager=True)
        fresh = ivfpq_topk(
            queries, encode_ivfpq(corpus, cents_f, cb_f, m=16, dim=64),
            cents_f, cb_f, corpus=corpus, k=k, nprobe=nprobe, m=16, dim=64,
        )
        return _recall_at_k(fresh, gt, k)

    k_full = coarse_k_for(n_now)
    # law-k fit: what production refit would build (smaller scan fraction
    # at fixed nprobe); same-k fit: isolates pure centroid staleness from
    # the k change (identical scan budget as the stale-grown probe).
    recall_fresh = fresh_recall(k_full)
    recall_fresh_same_k = fresh_recall(k_old) if k_full != k_old else recall_fresh
    refit_now = refit_recommended(grown, current_rows=n_now)
    # the exact trigger point of the drift rule: coarse_k_for(n) > 2k
    # first holds at n = (2k)² + 1 (ceil(sqrt) rounds k up, so this sits
    # at ~4.0x the fitted corpus, marginally above exactly-4x)
    refit_threshold = (2 * k_old) ** 2 + 1
    assert refit_recommended(grown, current_rows=refit_threshold)
    assert not refit_recommended(grown, current_rows=refit_threshold - 1)
    spark.stop()

    child = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", index_path,
         sf_dir, str(n_batches)],
        capture_output=True, text=True, timeout=1800,
    )
    if child.returncode != 0:
        sys.stderr.write(child.stdout[-2000:] + child.stderr[-2000:])
        raise SystemExit(child.returncode)
    probe = next(
        json.loads(line[len("PROBE_JSON ") :])
        for line in child.stdout.splitlines()
        if line.startswith("PROBE_JSON ")
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "fitted_rows": n_old,
                "grown_rows": n_now,
                "k_coarse_fitted": k_old,
                "k_coarse_law_now": coarse_k_for(n_now),
                "fit_save_wall_s": fit_wall,
                "append_encode_wall_s": append_wall,
                "recall_at_10_stale_grown": recall_stale,
                "recall_at_10_fresh_fit_law_k": recall_fresh,
                "recall_at_10_fresh_fit_same_k": recall_fresh_same_k,
                "refit_recommended_at_2x": refit_now,
                "refit_fires_at_rows": refit_threshold,
                "fresh_session_load_wall_s": probe["load_wall_s"],
                "fresh_session_probe_batch_walls_s": probe["probe_batch_walls_s"],
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe_main(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--grown":
        grown_main(
            sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf10/sf10",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1/sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    index_path = os.environ.get(
        "ANN_INDEX_PATH", "/tmp/ann_index_probe/ivfpq"
    )

    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.ann_index import save_ivfpq_index
    from dask_ssh_docker_spark.operators.ivfpq import (
        coarse_k_for,
        encode_ivfpq,
        train_ivfpq,
    )
    from dask_ssh_docker_spark.session import get_session
    from dask_ssh_docker_spark.sources import load_table

    spark = get_session("ann-index-fit")
    emb = load_table(spark, sf_dir, "embeddings")
    import pyarrow.parquet as papq

    n = papq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    k = coarse_k_for(n)
    corpus = emb.filter(F.col("vec_id") >= 5 * n_batches).select(
        "vec_id", "embedding"
    )
    t0 = time.perf_counter()
    cents, cb = train_ivfpq(corpus, k_coarse=k, coarse_iters=2, m=16, ks=16, dim=64)
    cb = cb.localCheckpoint(eager=True)
    index = encode_ivfpq(corpus, cents, cb, m=16, dim=64)
    save_ivfpq_index(index_path, cents, cb, index, m=16, dim=64, k_coarse=k)
    fit_save_wall = round(time.perf_counter() - t0, 3)
    spark.stop()  # the probe session must not inherit this JVM

    child = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", index_path,
         sf_dir, str(n_batches)],
        capture_output=True, text=True, timeout=1800,
    )
    if child.returncode != 0:
        sys.stderr.write(child.stdout[-2000:] + child.stderr[-2000:])
        raise SystemExit(child.returncode)
    probe = next(
        json.loads(line[len("PROBE_JSON ") :])
        for line in child.stdout.splitlines()
        if line.startswith("PROBE_JSON ")
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_rows": n,
                "k_coarse": k,
                "nprobe": 12,
                "fit_encode_save_wall_s": fit_save_wall,
                "fresh_session_load_wall_s": probe["load_wall_s"],
                "fresh_session_probe_batch_walls_s": probe["probe_batch_walls_s"],
            }
        )
    )


if __name__ == "__main__":
    main()
