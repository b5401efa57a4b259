"""Similarity search over embedding columns (SURVEY.md §2.H).

Two paths, same contract:

- **brute_force_topk** — exact: broadcast the (small) query set, score every
  corpus row map-side with JVM ``zip_with``/``aggregate`` vector math, keep
  top-k per query with a ranking window.  Cost O(|corpus|·|Q|·dim) compute,
  shuffle of |corpus|·|Q| scored rows.  The oracle baseline.
- **brute_force_topk_arrow** — exact, vectorized: numpy/BLAS matmul per
  Arrow batch + per-partition partial top-k, shuffling only
  |partitions|·|Q|·k rows.  The high-dim / large-|Q| exact path.
- **lsh_topk** — approximate scale path: random-hyperplane (sign) LSH.
  T tables × b hyperplane bits per vector (planes are seeded,
  deterministic, shipped as literal arrays — no fitting step); candidates
  share a bucket in ≥1 table, then exact re-rank on candidates only.
  Shuffle is |rows|·T bucket tuples; tune (b, T) for the
  recall/cost point.  At 100 TB the bucket join replaces the all-pairs
  explosion; skewed buckets split by AQE.

``embedding_neardup_pairs`` is the all-pairs exact variant (validation
scale); ``lsh_neardup_pairs`` the bucketed variant (scale path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, l2_norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row.

    ``queries`` must be small (it is broadcast); rename its id/vector
    columns to ``query_id``/``q_vec`` before the cross-score.

    Ranking runs through ``salted_topk`` (r11): the classic single
    ``Window.partitionBy(query_id)`` routes the ENTIRE scored corpus for
    one query through one task's sort — the unsplittable-window
    straggler (AQE cannot split window partitions), and for brute force
    the group size IS the corpus.  The two-round form sorts n/salt rows
    per task then re-ranks ≤ salt·k survivors; rows and ranks identical
    (deterministic total order with the corpus-id tie-break)."""
    from .partitioning import salted_topk

    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("__cvec")
    ).crossJoin(F.broadcast(q))
    sim = cosine_similarity("__qvec", "__cvec")
    return salted_topk(
        scored.withColumn("sim", sim),
        [query_id],
        [F.desc("sim"), F.asc(corpus_id)],
        corpus_id,
        k,
    ).select(query_id, corpus_id, F.round("sim", 6).alias("sim"), "rank")


def brute_force_topk_arrow(
    query_rows: list[tuple[int, list[float]]],
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized exact top-k — the scale variant of
    ``brute_force_topk``: per Arrow batch, one numpy/BLAS matmul scores
    the whole batch against all queries, ``argpartition`` keeps a k-row
    partial per query, and only |partitions|·|Q|·k partial rows reach the
    final ranking shuffle (vs |corpus|·|Q| scored rows on the JVM path).

    ``query_rows`` is driver-side data ``[(id, vector), ...]`` — bounded
    by contract (same as the LSH hyperplane literals), so plan
    construction stays job-free and nothing is collected inside the
    operator.  Results match ``brute_force_topk`` exactly up to float
    tie-breaks (pinned in tests/test_similarity.py)."""
    import pandas as pd

    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = np.array([q[1] for q in query_rows], dtype=np.float64)
    qn = qmat / np.maximum(
        np.linalg.norm(qmat, axis=1, keepdims=True), 1e-300
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            sims = xn @ qn.T  # (batch, q)
            kk = min(k, len(pdf))
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            ids = pdf[corpus_id].to_numpy()
            frames = [
                pd.DataFrame(
                    {
                        query_id: qids[j],
                        corpus_id: ids[part[:, j]],
                        "sim": sims[part[:, j], j],
                    }
                )
                for j in range(len(qids))
            ]
            yield pd.concat(frames, ignore_index=True)

    partials = corpus.select(corpus_id, vec_col).mapInPandas(
        score, schema=f"{query_id} long, {corpus_id} long, sim double"
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("sim", 6).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def _bucket_udf(planes: np.ndarray):
    """Vectorized bucket ids: ONE BLAS matmul per Arrow batch against all
    ``tables × bits`` hyperplanes, sign bits packed per table.

    This replaced a ``tables × bits`` forest of ``aggregate``/``zip_with``
    fold expressions: higher-order functions are never whole-stage-
    codegen'd, so the forest evaluated ~dim element steps per plane
    INTERPRETED — and, plan-shape-dependent, sometimes re-evaluated —
    measured bimodal 4-34 s at sf0.1 for what is one (n, dim)·(dim, 192)
    matmul.  Sign convention matches the expression form (``d ≥ 0`` sets
    the bit), so buckets are unchanged wherever the fold's sequential sum
    and numpy's pairwise sum agree in sign — everywhere except |dot|
    within float error of zero."""
    tables_, bits_, dim_ = planes.shape
    flat = planes.reshape(tables_ * bits_, dim_).T  # (dim, tables*bits)
    weights = (1 << np.arange(bits_)).astype(np.int64)

    # no parameter annotations: under `from __future__ import annotations`
    # the stringified hints defeat pandas_udf's signature inference — the
    # returnType + PandasUDFType-free scalar form is unambiguous
    @F.pandas_udf("array<int>")
    def buckets(vecs):
        import pandas as _pd

        if not len(vecs):
            return _pd.Series([], dtype=object)
        m = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        signs = (m @ flat) >= 0.0  # (n, tables*bits)
        packed = (signs.reshape(len(m), tables_, bits_) * weights).sum(axis=2)
        return _pd.Series(packed.astype(np.int32).tolist())

    return buckets


def lsh_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id, vec, table_idx, bucket) — one row per table per input row.

    ``dim`` is REQUIRED: the hyperplanes are generated driver-side from
    it, and inferring it from data would launch an eager ``first()`` job
    at plan-construction time (and could not handle an empty frame at
    all).  Query construction must stay job-free —
    ``tests/test_similarity.py`` asserts zero jobs run while building
    this plan."""
    if dim is None:
        raise ValueError(
            f"lsh_bucketed requires dim= (the length of the {vec_col!r} "
            "arrays): inferring it from data would run an eager job at "
            "plan-construction time and fails on an empty frame"
        )
    planes = _hyperplanes(dim, bits, tables, seed)
    bucket_arr = _bucket_udf(planes)(F.col(vec_col))
    # the UDF column materializes in its own ArrowEvalPython node, so the
    # posexplode consumes a computed attribute — no per-output-row
    # re-evaluation of the bucket computation
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(bucket_arr).alias("table_idx", "bucket"),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: join query and corpus rows sharing any LSH
    bucket, exact-score only those candidates, rank per query.

    ``dim`` is REQUIRED (see ``lsh_bucketed`` — no plan-time jobs)."""
    if dim is None:
        raise ValueError(
            f"lsh_topk requires dim= (the length of the {vec_col!r} "
            "arrays); plan construction must not run jobs"
        )
    # Late materialization (r9 per-site audit — same shape that fixed
    # lsh_neardup_pairs in r6, 272 s → 4.5 s at sf1): the bucket join and
    # the candidate dedup move NO vector bodies — ``lsh_bucketed``'s
    # ``tables×`` explode would otherwise multiply every 64-float payload
    # T times through the join and the dedup exchange (and the Python-UDF
    # node upstream hides size stats, so that byte-heavy exchange can't
    # even be planned well).  Only (query_id, corpus_id) tuples shuffle;
    # vectors re-attach ONCE per side afterwards, keyed by id.  This
    # replaces the r8 width-pin question entirely: the bare-id exchange
    # is tiny under every posture, and the join-back exchanges carry each
    # vector once instead of T times — the property that survives 100×.
    qb = lsh_bucketed(queries, query_id, vec_col, bits, tables, seed, dim=dim).select(
        query_id, "table_idx", "bucket"
    )
    cb = lsh_bucketed(corpus, corpus_id, vec_col, bits, tables, seed, dim=dim).select(
        corpus_id, "table_idx", "bucket"
    )
    # id-keyed dedup: rows with equal ids are identical (same vectors),
    # so deduping on the id pair alone is equivalent to distinct() over
    # the full candidate row.  The re-attach sides are deduped on id too
    # (ADVICE r9): if an input carries duplicate ids, the joins back
    # would otherwise multiply each candidate pair by the id's input
    # multiplicity and let one corpus_id occupy several top-k slots.
    # The dedup shares the join's hash partitioning on the id (one
    # exchange, reused), so it costs no extra shuffle.
    cands = (
        qb.join(cb, ["table_idx", "bucket"])
        .select(query_id, corpus_id)
        .dropDuplicates([query_id, corpus_id])
        .join(
            queries.select(query_id, F.col(vec_col).alias("__qvec"))
            .dropDuplicates([query_id]),
            query_id,
        )
        .join(
            corpus.select(corpus_id, F.col(vec_col).alias("__cvec"))
            .dropDuplicates([corpus_id]),
            corpus_id,
        )
    )
    sim = cosine_similarity("__qvec", "__cvec")
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        cands.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact all-pairs cosine near-dup (id_a < id_b, sim ≥ threshold).
    O(n²) — validation scale; use ``lsh_neardup_pairs`` beyond that.

    Two cost controls that change NO math (the dot stays the same
    in-order JVM fold, so oracle doubles are untouched):

    - per-vector norms are computed ONCE in each side's projection
      instead of re-folding both arrays per pair (cosine re-derives
      |a| and |b| for every pair otherwise — 2/3 of the interpreted
      work at n² pairs);
    - the stream side is widened to the cluster before the nested-loop
      join: the corpus arrives as 1-2 parquet splits at validation
      scale, which otherwise serializes the ENTIRE n² scan onto one
      task (measured: single thread pegged 53 min at sf1)."""
    from ..functions.vector import dot, l2_norm

    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    width = df.sparkSession.sparkContext.defaultParallelism
    if a.rdd.getNumPartitions() < width:  # gated: no-op on wide scans
        a = a.repartition(width, "id_a")
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    sim = dot("__va", "__vb") / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def neardup_bits_for(
    n_rows: int, target_bucket_rows: int = 64, floor_bits: int = 8
) -> int:
    """Scale-appropriate hyperplane count for ``lsh_neardup_pairs``.

    At FIXED bits the candidate volume of the bucket self-join is
    ~n²·T/2^bits — quadratic in the corpus.  Measured consequence
    (BENCH_NOTES r10 §10): at sf10 (200k isotropic vectors) the default
    8 bits put ~780 rows in every one of 2048 bucket cells → ~0.6B
    candidate id-pairs through the join + distinct, which spilled a
    local executor to disk-full.  Holding the expected bucket occupancy
    constant instead (``bits = log2(n / target_bucket_rows)``) makes
    candidates ~n·target·T/2 — LINEAR in n: the knob must scale with
    log2(corpus), exactly like PQ's shortlist scales with corpus
    (tests/test_pq.py lesson, r5).  The floor keeps small/validation
    corpora on the historical bucketization (≤ ~16k rows → 8 bits →
    byte-identical outputs to every prior round's record).

    More bits at fixed tables lowers per-pair recall (p_bucket =
    (1−θ/π)^bits per table) — pair with ``neardup_tables_for(bits)``,
    which raises the table count alongside so design-band recall stays
    constant as the corpus grows (ADVICE r10).  The subset-of-exact
    guarantee is bits-independent (every candidate is exact-verified)."""
    import math

    if n_rows <= 0:
        return floor_bits
    return max(floor_bits, math.ceil(math.log2(max(1.0, n_rows / target_bucket_rows))))


def neardup_tables_for(
    bits: int,
    design_sim: float = 0.9,
    target_recall: float = 0.93,
    floor_tables: int = 8,
) -> int:
    """Table count holding DESIGN-BAND recall constant as ``bits`` grows.

    ``neardup_bits_for`` keeps the bucket join linear in the corpus, but
    bits alone at fixed tables collapses recall (ADVICE r10): the
    per-table bucket probability for a pair at similarity s is
    p = (1−θ/π)^bits with θ = arccos(s), and recall over T tables is
    1−(1−p)^T.  At the query's
    own 0.4 threshold, 8 tables give ~18% at 8 bits but ~3% at the 12
    bits chosen at sf10.  This helper sizes T so recall at the DESIGN
    similarity (0.9 — the band "near-duplicate" actually means) never
    degrades: T = ⌈ln(1−R)/ln(1−p(0.9)^bits)⌉, floored at the
    historical 8 so validation-scale runs (8 bits) are byte-identical
    to every prior round's record (T(8)=8).

    Growth law: p(0.9) = 0.8564, so T ∝ (1/0.8564)^bits = 2^(0.224·bits)
    → with bits = log2(n/64), T ∝ (n/64)^0.224 and total candidate
    volume ∝ n^1.22 — the standard LSH ρ-exponent trade, mildly
    super-linear instead of the quadratic fixed-bits path or the
    recall collapse of fixed tables.  Concrete points: bits 8 → T 8
    (recall 0.935 at sim 0.9, 0.18 at 0.4); bits 12 (sf10, 200k rows)
    → T 16 (0.93 at 0.9, 0.062 at 0.4 — degraded but 5× the fixed-T
    figure and measured, not silent:
    tests/test_similarity.py::test_neardup_recall_at_scale).
    Borderline-band (sim≈0.4) recall is NOT a design target at scale —
    66° apart is not a near-duplicate; callers needing exhaustive 0.4
    pairs use ``embedding_neardup_pairs`` (exact, validation-capped)."""
    import math

    p = (1.0 - math.acos(design_sim) / math.pi) ** bits
    if p >= 1.0:
        return floor_tables
    t = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p))
    return max(floor_tables, t)


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs restricted to LSH-bucket cohabitants — the scale
    path: |rows|·T bucket tuples shuffle instead of n² pairs.  Pass
    ``dim`` to keep plan construction job-free (see ``lsh_bucketed``)
    and size ``bits`` with ``neardup_bits_for(corpus_rows)`` — the
    default 8 is the ≤16k-row validation bucketization and goes
    quadratic-candidate at larger corpora (see that helper's docstring
    for the measured sf10 failure)."""
    from ..functions.vector import dot, l2_norm

    bkt = lsh_bucketed(df, id_col, vec_col, bits, tables, seed, dim=dim)
    a = bkt.select(F.col(id_col).alias("id_a"), "table_idx", "bucket")
    b = bkt.select(F.col(id_col).alias("id_b"), "table_idx", "bucket")
    # candidate DEDUP moves vector bodies NOWHERE: only (id_a, id_b)
    # tuples pass through the bucket join and the distinct — carrying
    # both 64-float payloads through the dedup exchange made the "scale
    # path" slower than the all-pairs baseline (272 s vs 100 s at sf1;
    # this shape: 4.5 s).  Vectors re-attach once per side afterwards,
    # with per-vector norms hoisted into the projection (same in-order
    # JVM fold — oracle doubles untouched).
    cands = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    sim = dot("__va", "__vb") / F.nullif(
        F.col("__na") * F.col("__nb"), F.lit(0.0)
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein '98):
    fetch an exact top-``pool`` candidate set per query, then greedily
    pick ``k`` results maximizing ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c,s)``
    — the standard diversity-aware final stage of a retrieval/RAG
    pipeline (plain top-k returns near-duplicate passages; MMR trades a
    little relevance for coverage).

    Execution shape: the candidate fetch is ``brute_force_topk`` (or any
    ANN path producing the same (query_id, vec_id, sim) contract); the
    greedy selection is inherently sequential *within* a query but
    embarrassingly parallel *across* queries, so it runs as one
    ``applyInPandas`` over ``pool``-row groups — O(k·pool·dim) numpy work
    per query, never a driver loop.

    Determinism: candidates arrive sorted by (sim desc, id); ties in the
    greedy objective break on (score desc, id asc); float64 numpy
    arithmetic on identical inputs.
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    cands = brute_force_topk(
        queries, corpus, k=pool, query_id=query_id,
        corpus_id=corpus_id, vec_col=vec_col,
    )
    # The greedy MMR objective needs only candidate vectors plus the
    # precomputed relevance sim — query vectors are already folded into
    # `sim` by brute_force_topk, so no query-side join is needed.
    grouped = cands.join(
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cvec")),
        corpus_id,
    ).select(query_id, corpus_id, "sim", "__cvec")

    out_schema = (
        f"{query_id} long, rank int, {corpus_id} long, "
        "relevance double, mmr_score double"
    )

    def _mmr(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["sim", corpus_id], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.array(pdf["__cvec"].tolist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300)
        vn = vecs / norms
        rel = pdf["sim"].to_numpy(dtype=np.float64)
        ids = pdf[corpus_id].to_numpy(dtype=np.int64)
        n = len(pdf)
        sims = vn @ vn.T  # pool×pool candidate-candidate cosine
        selected: list[int] = []
        remaining = list(range(n))
        rows = []
        for rank in range(1, min(k, n) + 1):
            if not selected:
                scores = rel.copy()
            else:
                max_sim = sims[:, selected].max(axis=1)
                scores = lam * rel - (1.0 - lam) * max_sim
            best, best_key = None, None
            for i in remaining:
                key = (-scores[i], ids[i])
                if best is None or key < best_key:
                    best, best_key = i, key
            rows.append(
                (
                    int(pdf[query_id].iloc[0]),
                    rank,
                    int(ids[best]),
                    round(float(rel[best]), 6),
                    round(float(scores[best]), 6),
                )
            )
            selected.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            rows,
            columns=[query_id, "rank", corpus_id, "relevance", "mmr_score"],
        )

    from ..functions.udf import _pin_group_width

    return (
        _pin_group_width(grouped, [query_id])
        .groupBy(query_id)
        .applyInPandas(_mmr, out_schema)
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
