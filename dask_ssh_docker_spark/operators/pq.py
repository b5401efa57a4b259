"""Product quantization (PQ) approximate nearest neighbor — the
memory-compression ANN path (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011), completing the similarity triad
next to LSH (``operators/similarity.py``) and IVF (``operators/ivf.py``).

The 100 TB story is **memory**, not scan fraction: a 64-dim float vector
(256 B) compresses to ``m`` sub-codes (8 bytes at m=8) — a 32× smaller
index that fits in RAM where the raw vectors cannot.  Scoring never
touches the original vectors: per query one small lookup table (LUT) of
query↔sub-centroid distances is built, and each corpus item's
approximate distance is ``Σ_sub LUT[sub, code_sub]`` — m array lookups.

DataFrame shapes (all JVM higher-order functions, no Python in any
per-row path):

- **train**: vectors explode into (sub, subvector) rows ONCE; every
  Lloyd iteration is a single broadcast cross-score against the m·ks
  sub-centroids + one (sub, cid) groupBy-mean shuffle — all subspaces
  train together in one pipeline, not m separate jobs.
- **encode**: broadcast cross-score → min-distance code per (vec, sub)
  via one window on (vec, sub), then codes collected per vec — two
  bounded shuffles of (vec, sub) rows; output is one code-array row per
  vector (the compressed index).
- **search (ADC)**: LUT rows are bounded (|Q|·m·ks) → built as a
  DataFrame and crossed BROADCAST against the code index; the score is
  a map-side ``aggregate`` over the code array into the LUT array —
  zero shuffle until the final per-query top-k rank window.

Determinism: seeded/ordered init (first ks subvectors by id), ties in
assignment broken on centroid id, ties in top-k broken on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localrel import local_frame


def _sub_sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --- chunked GEMM distance kernels (shared with operators/ivfpq.py) -------
#
# ‖x−c‖² = ‖x‖² + ‖c‖² − 2·x·c: one small GEMM per chunk instead of the
# (n, k, dim) broadcast-subtract temporary.  Chunking keeps every
# temporary a few MB: the subtract form allocates an n×k×dim scratch per
# batch, which is both cache-hostile and catastrophically slow on
# mmap-threshold allocators (measured here: first-touch of an 80 MB
# numpy temp ~15 s vs 4 ms for 8 MB — 20-30× end-to-end on the encode
# pass; see BENCH_NOTES "R7 kernels").

_KERNEL_CHUNK = 2048


def _nearest_rows(x, C, chunk: int = _KERNEL_CHUNK):
    """(n,) argmin_c ‖x−c‖² per row; ties -> lowest centroid id."""
    import numpy as np

    C2 = (C * C).sum(axis=1)
    CT = np.ascontiguousarray(C.T)
    out = np.empty(len(x), dtype=np.int32)
    for i in range(0, len(x), chunk):
        xc = x[i : i + chunk]
        d2 = (xc * xc).sum(axis=1)[:, None] + C2[None, :] - 2.0 * (xc @ CT)
        out[i : i + chunk] = d2.argmin(axis=1)
    return out


def _subspace_codes(r, cents, have, chunk: int = _KERNEL_CHUNK):
    """(n, m) argmin codes per subspace for r: (n, m, subdim); ``have``
    masks clamped (untrained) codebook slots to +inf."""
    import numpy as np

    m = cents.shape[0]
    c2 = (cents**2).sum(axis=-1)  # (m, ks)
    centsT = np.ascontiguousarray(cents.transpose(0, 2, 1))  # (m, subdim, ks)
    miss = ~have
    out = np.empty((len(r), m), dtype=np.int32)
    for i in range(0, len(r), chunk):
        rc = r[i : i + chunk]
        d = (rc * rc).sum(axis=-1)[..., None] + c2[None, :, :]
        for s in range(m):
            d[:, s, :] -= 2.0 * (rc[:, s, :] @ centsT[s])
        if miss.any():
            d[:, miss] = np.inf
        out[i : i + chunk] = d.argmin(axis=-1)
    return out


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 3,
    sample_max: int = 100_000,
) -> DataFrame:
    """(sub, cid, centroid: array<double>) — m per-subspace codebooks of
    ks centroids each (clamped to the sample size when the corpus has
    fewer than ks vectors; an empty corpus raises ValueError).
    Deterministic init: the first ks subvectors by vec_id in each
    subspace; assignment ties break on the lowest cid.

    Training runs DRIVER-SIDE in numpy on a bounded deterministic sample
    (the ``sample_max`` lowest-id vectors — one ``TakeOrdered`` job).
    That is the standard PQ posture at scale (faiss trains codebooks on
    a 10⁵-10⁶ sample regardless of corpus size — k-means quality
    saturates long before that): the ``m·ks`` centroids are KBs of
    state, so distributing Lloyd buys nothing and previously cost one
    broadcast cross-score + windowed argmin + grouped mean SHUFFLE per
    iteration, all interpreted higher-order-function distance folds
    (measured: 15.3 s of sim_topk_pq's 18.9 s at sf1).  The numpy loop
    is milliseconds at the sample bound, and ENCODING — the part that
    does scale with the corpus — stays a distributed DataFrame pass
    (``pq_encode``)."""
    import numpy as np

    assert dim % m == 0, "dim must divide evenly into m subspaces"
    subdim = dim // m
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(sample_max)
        .collect()
    )
    if not sample:
        raise ValueError(
            "train_pq_codebooks: corpus is empty — no vectors to train on"
        )
    x = np.asarray([r[1] for r in sample], dtype=np.float64)  # (n, dim)
    rows = _kmeans_subspace_rows(x, m, ks, iters)
    cb = local_frame(
        corpus.sparkSession, rows, "sub int, cid int, centroid array<double>"
    )
    # r13 optimization round: the driver just computed these centroids —
    # attach the tensors so encode/search skip their collect jobs (frames
    # re-read from storage keep the collect fallback).
    cb._graft_np_codebooks = _codebook_tensors(rows, m, x.shape[1] // m)
    return cb


def _codebook_tensors(rows, m: int, subdim: int):
    """(cents (m, n_cids, subdim), have (m, n_cids)) from codebook rows —
    the driver already holds them after training; attaching the tensors
    to the codebook frame saves each downstream consumer a collect job.
    Shared by raw-vector PQ (here) and residual IVF-PQ."""
    import numpy as np

    n_cids = max(r[1] for r in rows) + 1
    cents = np.zeros((m, n_cids, subdim), dtype=np.float64)
    have = np.zeros((m, n_cids), dtype=bool)
    for sub, cid, centroid in rows:
        cents[sub, cid] = centroid
        have[sub, cid] = True
    return cents, have


def _kmeans_subspace_rows(x, m: int, ks: int, iters: int) -> list[tuple]:
    """Driver-side per-subspace Lloyd over a bounded (n, dim) sample —
    shared by raw-vector PQ (above) and residual IVF-PQ
    (operators/ivfpq.py).  Deterministic: init = first ks subvectors in
    sample order, assignment ties -> lowest cid, empty clusters keep
    their centroid.  ks clamps to the sample size (fewer distinct
    centroids cannot exist anyway)."""
    subdim = x.shape[1] // m
    ks = min(ks, len(x))
    rows: list[tuple] = []
    for sub in range(m):
        s = x[:, sub * subdim : (sub + 1) * subdim]
        cents = s[:ks].copy()
        for _ in range(iters):
            # chunked-GEMM squared distances; argmin ties -> lowest cid
            assign = _nearest_rows(s, cents)
            for cid in range(ks):
                members = s[assign == cid]
                if len(members):
                    cents[cid] = members.mean(axis=0)
        rows.extend(
            (sub, cid, [float(v) for v in cents[cid]]) for cid in range(ks)
        )
    return rows


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, codes: array<int>[m]) — the compressed index: nearest
    sub-centroid id per subspace; assignment ties break on the lowest cid
    (numpy argmin picks the first minimum).

    ONE Arrow-batched map pass, ZERO shuffle: the codebook is bounded
    (m·ks rows) and closes over the encode function as a numpy array, so
    each batch scores all subspaces with vectorized BLAS-shaped ops.
    The previous DataFrame form (explode (vec, sub) rows → broadcast
    join → interpreted higher-order distance folds → argmin window)
    shuffled m rows per vector twice and evaluated |corpus|·m·ks
    interpreted folds — measured several× slower at every scale tested."""
    import numpy as np

    subdim = dim // m
    t = getattr(codebooks, "_graft_np_codebooks", None)
    if t is not None:  # trained this session — tensors already on the driver
        cents, have = t
    else:
        cb_rows = codebooks.collect()  # bounded by construction: m·ks rows
        n_cids = max(r["cid"] for r in cb_rows) + 1
        cents = np.zeros((m, n_cids, subdim), dtype=np.float64)
        have = np.zeros((m, n_cids), dtype=bool)
        for r in cb_rows:
            cents[r["sub"], r["cid"]] = r["centroid"]
            have[r["sub"], r["cid"]] = True

    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64).reshape(
                n, m, subdim
            )
            codes = _subspace_codes(x, cents, have)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_topk(
    queries: DataFrame,
    index: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    ks: int = 16,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(query_id, vec_id, approx_dist, rank) — asymmetric-distance (ADC)
    top-k: LUT per query (|Q|·m·ks rows, bounded → broadcast), score =
    map-side fold of the code array into the flattened LUT array; the
    only shuffle is the final per-query rank window."""
    subdim = dim // m
    # LUTs are computed DRIVER-SIDE (r13 optimization round, guide §5):
    # the query frame is bounded by contract and the codebook is m·ks
    # rows the driver usually already holds (train attach) — one bounded
    # collect replaces the former explode → broadcast-join → windowed
    # aggregate → eager localCheckpoint chain (several synchronous jobs
    # whose only product was a |Q|-row table).  The squared distance is
    # the IDENTICAL left-fold ``((0 + d₀²) + d₁²) + …`` the JVM
    # ``aggregate`` expression performed, so LUT doubles are bit-equal
    # and ADC scores/shortlists are unchanged.  The LUT frame becomes a
    # local relation — legally broadcast-hintable without materialization.
    t = getattr(codebooks, "_graft_np_codebooks", None)
    if t is not None:
        cb_cents, cb_have = t
        cb_entries = [
            (sub, cid, cb_cents[sub, cid])
            for sub in range(cb_cents.shape[0])
            for cid in range(cb_cents.shape[1])
            if cb_have[sub, cid]
        ]
    else:
        cb_entries = [
            (r["sub"], r["cid"], r["centroid"]) for r in codebooks.collect()
        ]
    # slot order (sub·ks + cid, the join/aggregate's sort key) ≡
    # (sub, cid) lexicographic since cid < ks always; the dense index in
    # the sorted LUT is therefore sub·n_cids + cid — the stride rule the
    # Spark aggregate produced under codebook clamping (ADVICE r7).
    cb_entries.sort(key=lambda e: e[0] * ks + e[1])
    qid_type = queries.schema[query_id].dataType.simpleString()
    q_sel = queries.select(query_id, query_vec)
    q_rows = q_sel.collect()
    lut_rows = []
    for row in q_rows:
        qid, qv = row[0], row[1]
        lut = []
        for sub, _cid, cent in cb_entries:
            acc = 0.0
            base = sub * subdim
            for j in range(subdim):
                dj = float(qv[base + j]) - float(cent[j])
                acc = acc + dj * dj
            lut.append(acc)
        lut_rows.append((qid, lut))
    # LocalRelation (r14, functions/localrel.py): job-free to broadcast,
    # no 32-task parallelized-RDD scan per consumer.
    luts = local_frame(
        queries.sparkSession, lut_rows, f"qid {qid_type}, lut array<double>"
    )
    n_queries = len(lut_rows)
    # Stride derives from the LUT itself (len = m·n_cids), NOT the ks
    # parameter: _kmeans_subspace_rows clamps ks to the training-sample
    # size, so a small corpus yields a narrower codebook and indexing by
    # the nominal ks would read wrong cells (ADVICE r7).
    stride = (F.size(F.col("lut")) / F.lit(m)).cast("int")
    scored = index.crossJoin(F.broadcast(luts)).withColumn(
        "approx_dist",
        F.aggregate(
            F.zip_with(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.col("codes"),
                lambda s, c: F.col("lut")[s * stride + c],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("qid").orderBy("approx_dist", "vec_id")
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "vec_id", "approx_dist", "rank")
    )
    # The query rows were just collected for the LUTs — attach them (the
    # tensor-attach pattern) so pq_topk_rerank can bound its shortlist
    # broadcast with a no-op limit instead of an eager-checkpoint job and
    # rebuild the re-rank's query side as a job-free local relation
    # instead of re-scanning storage (r14, guide §5).
    out._graft_n_queries = n_queries
    out._graft_query_rows = (q_rows, q_sel.schema)
    return out


def pq_topk_rerank(
    queries: DataFrame,
    index: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    expand: int = 5,
    ks: int = 16,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(query_id, vec_id, dist, rank) — the production PQ shape: ADC
    shortlist of ``k·expand`` candidates from the compressed index, then
    EXACT re-rank of only those candidates against their raw vectors.

    At 100 TB the raw vectors never fully scan: the ADC pass touches only
    the code index (32× smaller), and the re-rank fetches ``|Q|·k·expand``
    vectors by id (broadcast semi-join).  Measured on the 64-dim testdata:
    shortlist recall@10-in-50 ≈ 0.85 vs exact L2 (pinned in
    tests/test_pq.py)."""
    # |Q|·k·expand rows by the rank filter — bounded; pq_topk attaches the
    # collected |Q|, so a no-op ``limit(bound)`` makes the bound visible
    # to the planner and the forced-broadcast audit (the setsim
    # ``limit(n_docs)`` recipe) with NO materialization job — the former
    # eager localCheckpoint paid one extra job per run purely to seal the
    # hint (r14 optimization round, guide §5).  A frame without the
    # attribute (never produced today) would keep the checkpoint path.
    sl = pq_topk(
        queries, index, codebooks, k=k * expand, ks=ks,
        query_id=query_id, query_vec=query_vec, m=m, dim=dim,
    )
    n_q = getattr(sl, "_graft_n_queries", None)
    q_attach = getattr(sl, "_graft_query_rows", None)
    sl = sl.select("query_id", F.col("vec_id").alias("cand_id"))
    shortlist = (
        sl.limit(n_q * k * expand)
        if n_q is not None
        else sl.localCheckpoint(eager=True)
    )
    cand = corpus.join(
        F.broadcast(shortlist), corpus[id_col] == shortlist["cand_id"]
    ).select("query_id", "cand_id", F.col(vec_col).alias("cand_vec"))
    # re-rank query side as a job-free local relation (see pq_topk): the
    # broadcast of a LocalTableScan collects on the driver with no job,
    # where broadcasting the original frame re-scanned storage
    q_side = (
        local_frame(queries.sparkSession, *q_attach)
        if q_attach is not None
        else queries
    )
    exact = (
        cand.join(F.broadcast(q_side), "query_id")
        .withColumn("dist", _sub_sq_dist("cand_vec", query_vec))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "cand_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cand_id").alias("vec_id"), "dist", "rank")
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
