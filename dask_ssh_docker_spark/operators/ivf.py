"""IVF (inverted-file) approximate nearest-neighbor index
(SURVEY.md §2.H similarity-search scale path, alongside the LSH variant).

Classic IVF-Flat, DataFrame-first and fully deterministic:

1. **train**: k coarse centroids by Lloyd iterations — assignment is a
   broadcast cross-score (centroids are tiny), update is a groupBy mean.
   Seeded deterministic init (first k vectors by id); each iteration is
   one shuffle of (cluster, vector) partial sums.
2. **index**: every vector assigned to its nearest centroid —
   (centroid_id, vec_id, embedding) — in production this is written
   partitioned by ``centroid_id`` so a probe reads only its partitions.
3. **search**: score query→centroids (broadcast), keep ``nprobe`` nearest
   lists, exact-rank only vectors in those lists.  Scan fraction ≈
   nprobe/k of the corpus vs 1.0 for brute force.

All vector math is JVM higher-order functions (no Python in the scoring
path); the Python loop only orchestrates Lloyd iterations (bounded, each
a persisted DataFrame job — lineage cut per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localrel import local_frame
from ..functions.vector import cosine_similarity


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
    sample_fraction: float | None = None,
    seed: int = 20260813,
    init_centroids=None,
) -> DataFrame:
    """(centroid_id, centroid: array<double>) — Lloyd's with deterministic
    init (first k vectors by id).

    ``sample_fraction``: train on a seeded Bernoulli sample of the corpus
    instead of every row — the 100 TB path (SCALE.md): k-means quality
    depends on the *distribution*, not the row count, so a modest sample
    trains centroids as well as the full corpus while each Lloyd
    iteration scans only the sample.  The sample grows with the corpus at
    a fixed fraction — choose ``fraction ≈ target_rows / corpus_rows``
    for a size-targeted training frame.  Indexing/search still cover the
    FULL corpus; only training reads the sample.

    Reproducibility note: ``sample(seed=)`` derives per-partition streams,
    so the selected rows are stable only for a fixed partition layout —
    re-training after a re-partitioned re-read may select a different
    (equally valid) sample.  Centroids are deterministic given the same
    input layout, not across layouts.

    ``init_centroids``: the first-k-by-id init vectors, pre-collected by a
    caller that already holds them (train_ivfpq's ordered PQ training
    sample is a superset of this exact set) — skips the init's global
    top-k corpus pass; values must equal what the collect below would
    return, so the trained centroids are bit-identical either way (pinned
    in tests/test_ivfpq.py)."""
    import numpy as np

    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError("sample_fraction must be in (0, 1]")
        corpus = corpus.sample(fraction=sample_fraction, seed=seed)
        if corpus.limit(k).count() < k:
            raise ValueError(
                f"seeded sample has fewer than k={k} rows; raise "
                "sample_fraction (or train on the full corpus)"
            )
    if init_centroids is not None:
        C = np.asarray(init_centroids, dtype=np.float64)[:k]
    else:
        init = (
            corpus.orderBy(id_col)
            .limit(k)
            .select(
                F.transform(vec_col, lambda x: x.cast("double")).alias("centroid"),
            )
            .collect()
        )
        C = np.asarray([r["centroid"] for r in init], dtype=np.float64)
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).persist()
    try:
        for _ in range(iters):
            # ONE Arrow job per Lloyd iteration: each partition assigns its
            # vectors to the closed-over centroid matrix (chunked-GEMM,
            # pq._nearest_rows) and emits k partial (count, sum-vector)
            # rows — corpus vectors never explode into (row × dim) tuples
            # and never shuffle; only partitions×k partials come back.
            # The driver reduces the partials in sorted order, so repeat
            # runs on the same layout sum identical multisets identically
            # (the run-to-run determinism the sample-training test pins).
            rows = _partial_sums(vecs, C).collect()
            counts = np.zeros(len(C))
            sums = np.zeros_like(C)
            for r in sorted(rows, key=lambda r: (r["cid"], r["n"], r["s"])):
                counts[r["cid"]] += r["n"]
                sums[r["cid"]] += np.asarray(r["s"])
            # A centroid whose cluster went empty keeps its previous
            # position instead of silently shrinking k (which would break
            # the nprobe/k scan-fraction contract downstream).
            nonempty = counts > 0
            C = np.where(nonempty[:, None], sums / np.where(nonempty, counts, 1.0)[:, None], C)
    finally:
        vecs.unpersist()
    spark = corpus.sparkSession
    # LocalRelation (r14, functions/localrel.py): the list-backed frame
    # scanned as a parallelized RDD wherever it is consumed as a frame
    # (sim_topk_ivf broadcast-crossJoins it); the Arrow local relation is
    # job-free and carries exact size statistics.
    out = local_frame(
        spark,
        [(i, [float(x) for x in C[i]]) for i in range(len(C))],
        "centroid_id int, centroid array<double>",
    )
    # Driver-side tensor attach (r13 optimization round, guide §5): the
    # centroid matrix was just computed HERE — hand it to downstream
    # consumers (assignment, encode, LUT build) as an attribute so they
    # skip a synchronous collect job each.  The DataFrame stays the API
    # (and the persisted/loaded-index path still collects); values are
    # bit-identical — float64 survives the createDataFrame round-trip.
    out._graft_np_centroids = np.ascontiguousarray(C, dtype=np.float64)
    return out


def _partial_sums(vecs: DataFrame, C) -> DataFrame:
    """(cid, n, s): per-partition per-centroid count and sum-vector
    partials for one Lloyd update — ≤ partitions×k rows total.  At 100 TB
    train on ``sample_fraction`` (bounded partitions) so the driver-side
    reduce stays small; the partials themselves are the map-side-combine
    this update needs, computed in the SAME pass as the assignment."""
    import numpy as np

    from .pq import _nearest_rows

    def go(batches):
        import pandas as pd

        counts = np.zeros(len(C))
        sums = np.zeros_like(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float64)
            cid = _nearest_rows(x, C)
            for c in np.unique(cid):
                m = cid == c
                counts[c] += int(m.sum())
                sums[c] += x[m].sum(axis=0)
        hit = np.nonzero(counts)[0]
        if len(hit):
            yield pd.DataFrame(
                {
                    "cid": hit.astype("int32"),
                    "n": counts[hit],
                    "s": [list(sums[c]) for c in hit],
                }
            )

    return vecs.mapInPandas(go, schema="cid int, n double, s array<double>")


def _assign(vecs: DataFrame, cents: DataFrame, keep_vec: bool = False) -> DataFrame:
    """(id, centroid_id[, v]): nearest centroid per vector — ONE Arrow
    map pass closing over the collected centroid matrix (bounded k rows;
    ``cents`` is always materialized upstream, so the collect is a cheap
    local fetch).  Replaces the broadcast crossJoin + interpreted
    higher-order distance fold + per-id argmin window: zero shuffle,
    chunked-GEMM math (``pq._nearest_rows``) — the same interpreted-HOF
    →Arrow rewrite as the LSH bucket pass (PLANS.md), measured ~10× on
    the sf1 Lloyd loop.  ``keep_vec`` passes the vector through so the
    training update needs no join back."""
    import numpy as np

    from .pq import _nearest_rows

    C = getattr(cents, "_graft_np_centroids", None)
    if C is None:  # e.g. centroids re-read from a persisted index
        rows = cents.collect()
        dim = len(rows[0]["centroid"])
        C = np.zeros((max(r["centroid_id"] for r in rows) + 1, dim))
        for r in rows:
            C[r["centroid_id"]] = r["centroid"]
    id_t = vecs.schema["id"].dataType.simpleString()
    v_t = vecs.schema["v"].dataType.simpleString()

    def go(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float64)
            out = {"id": pdf["id"], "centroid_id": _nearest_rows(x, C)}
            if keep_vec:
                out["v"] = pdf["v"]
            yield pd.DataFrame(out)

    schema = f"id {id_t}, centroid_id int" + (f", v {v_t}" if keep_vec else "")
    return vecs.mapInPandas(go, schema=schema)


def build_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, vec_id, embedding) inverted lists.  At scale: write
    partitioned by centroid_id so probes scan only their lists."""
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        _assign(vecs, centroids)
        .join(vecs, "id")
        .select("centroid_id", F.col("id").alias(id_col), F.col("v").alias(vec_col))
    )


def ivf_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors probing only the ``nprobe`` nearest inverted
    lists per query."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        query_id,
        "__qv",
        "centroid_id",
        _sq_dist(F.transform("__qv", lambda x: x.cast("double")), F.col("centroid")).alias("d"),
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("d"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, "__qv", "centroid_id")
    )
    cands = probes.join(index, "centroid_id").select(
        query_id, "__qv", F.col(corpus_id), F.col(vec_col).alias("__cv")
    )
    sim = cosine_similarity("__qv", "__cv")
    w2 = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        cands.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("sim", 6).alias("sim"), "rank")
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
