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


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe_main(sys.argv[2], sys.argv[3], int(sys.argv[4]))
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
