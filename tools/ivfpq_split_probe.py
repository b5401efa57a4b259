#!/usr/bin/env python
"""IVF-PQ fit-vs-probe split at scale (VERDICT r10 item 6).

sim_topk_ivfpq is the suite's most expensive query; its cost is
dominated by the FIT phase (coarse Lloyd + residual codebooks), which a
production deployment pays once per corpus and amortizes over every
query batch.  This probe measures the split at the given sf_dir with the
shipped ``coarse_k_for`` sizing: fit (train) wall, encode wall, then
N_PROBE_BATCHES successive 5-query probe batches against the SAME index
— the fit-once/probe-many contract, stated as numbers.

Usage: python tools/ivfpq_split_probe.py [sf_dir] [n_batches]
Default sf_dir: /root/repo/testdata_sf10/sf10 (200k vectors -> k=448).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10/sf10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.operators.ivfpq import (
        coarse_k_for,
        encode_ivfpq,
        ivfpq_topk,
        probe_scan_rows,
        train_ivfpq,
    )
    from dask_ssh_docker_spark.session import get_session
    from dask_ssh_docker_spark.sources import load_table

    spark = get_session("ivfpq-split-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    import pyarrow.parquet as papq

    n = papq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    k = coarse_k_for(n)
    corpus = emb.filter(F.col("vec_id") >= 5 * n_batches).select(
        "vec_id", "embedding"
    )

    t0 = time.perf_counter()
    cents, cb = train_ivfpq(
        corpus, k_coarse=k, coarse_iters=2, m=16, ks=16, dim=64
    )
    cb = cb.localCheckpoint(eager=True)  # materialize fit fully
    fit_wall = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    idx = encode_ivfpq(corpus, cents, cb, m=16, dim=64).localCheckpoint(
        eager=True
    )
    encode_wall = round(time.perf_counter() - t0, 3)

    probe_walls, scan_rows = [], []
    for b in range(n_batches):
        queries = emb.filter(
            (F.col("vec_id") >= 5 * b) & (F.col("vec_id") < 5 * (b + 1))
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        t0 = time.perf_counter()
        out = ivfpq_topk(
            queries, idx, cents, cb, corpus,
            k=10, nprobe=12, expand=20, ks=16, m=16, dim=64,
        )
        rows = out.count()
        probe_walls.append(round(time.perf_counter() - t0, 3))
        scan_rows.append(
            probe_scan_rows(queries, idx, cents, nprobe=12)
        )
        assert rows > 0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "corpus_rows": n,
                "k_coarse": k,
                "nprobe": 12,
                "fit_wall_s": fit_wall,
                "encode_wall_s": encode_wall,
                "probe_batch_walls_s": probe_walls,
                "probe_scan_rows": scan_rows,
                # per-QUERY fraction of the corpus scanned (≈ nprobe/k)
                "scan_fraction_per_query": [
                    round(s / (n * 5), 5) for s in scan_rows
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
