"""Persisted ANN index (VERDICT r11 item 4): save/load for the IVF-PQ
and LSH indexes so fit-once/probe-many is real ACROSS sessions, not just
within one (``tools/ivfpq_split_probe.py`` measured the within-session
split: fit 15.9 s at 200k vectors vs 1.37 s warm probe — without
persistence every new session pays the fit again).

Layout (all Spark parquet writes — works on any Hadoop-FS path: local,
HDFS, S3):

``<path>/meta``       1-row parquet: format version + index kind + the
                      hyper-parameters the probe path must reproduce.
``<path>/centroids``  IVF-PQ coarse centroids (centroid_id, centroid).
``<path>/codebooks``  IVF-PQ residual sub-codebooks (sub, cid, centroid).
``<path>/codes``      IVF-PQ inverted lists, PARTITIONED BY centroid_id —
                      a probe that filters on its nprobe list ids prunes
                      parquet partitions and reads only those lists (the
                      on-disk analog of faiss's inverted-file layout).
``<path>/buckets``    LSH bucket table (id, table_idx, bucket),
                      PARTITIONED BY table_idx.  Vectors are NOT stored:
                      LSH probing late-materializes them from the source
                      corpus by id (operators/similarity.py rationale —
                      the index holds ids, the corpus holds payloads).

Determinism: everything persisted is the exact frame the in-session path
computes (seeded training), and parquet round-trips doubles/ints
losslessly — the round-trip pytest (tests/test_ann_index.py) asserts the
loaded probe output EQUALS the in-session pipeline's output row-for-row,
not merely recall parity.

Versioning: ``FORMAT_VERSION`` is written into meta and checked on load;
an incompatible or wrong-kind index fails fast with the found/expected
pair instead of mis-probing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FORMAT_VERSION = 1


def _write_meta(spark: SparkSession, path: str, kind: str, params: dict) -> None:
    import json

    meta = spark.createDataFrame(
        [(FORMAT_VERSION, kind, json.dumps(params, sort_keys=True))],
        "version int, kind string, params string",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _read_meta(spark: SparkSession, path: str, kind: str) -> dict:
    import json

    rows = spark.read.parquet(f"{path}/meta").collect()
    if len(rows) != 1:
        raise ValueError(f"ann_index: malformed meta at {path} ({len(rows)} rows)")
    meta = rows[0]
    if meta.version != FORMAT_VERSION or meta.kind != kind:
        raise ValueError(
            f"ann_index: incompatible index at {path}: found "
            f"(version={meta.version}, kind={meta.kind!r}), expected "
            f"(version={FORMAT_VERSION}, kind={kind!r})"
        )
    return json.loads(meta.params)


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class IvfPqIndex:
    centroids: DataFrame
    codebooks: DataFrame
    index: DataFrame  # (centroid_id, <id_col>, codes)
    m: int
    dim: int
    k_coarse: int
    id_col: str
    #: corpus size the centroids were trained on (None for pre-r13 indexes)
    fitted_rows: int | None = None


def save_ivfpq_index(
    path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    index: DataFrame,
    *,
    m: int,
    dim: int,
    k_coarse: int,
    id_col: str = "vec_id",
    fitted_rows: int | None = None,
) -> None:
    """Persist a trained+encoded IVF-PQ index.  ``index`` is the
    ``encode_ivfpq`` output; it lands partitioned by ``centroid_id`` so
    later probes scan only their nprobe lists (partition pruning).

    ``fitted_rows``: corpus size the centroids were TRAINED on — recorded
    in meta so ``refit_recommended`` can judge staleness after appends.
    When omitted it is read back from the just-written codes parquet
    (a footer-metadata count, no data scan)."""
    spark = centroids.sparkSession
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/codes"
    )
    if fitted_rows is None:
        fitted_rows = spark.read.parquet(f"{path}/codes").count()
    _write_meta(
        spark,
        path,
        "ivfpq",
        {
            "m": m,
            "dim": dim,
            "k_coarse": k_coarse,
            "id_col": id_col,
            "fitted_rows": int(fitted_rows),
        },
    )


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    """Load a persisted IVF-PQ index for probing.  The codes frame keeps
    its ``centroid_id`` partition column — an ``isin(probe_ids)`` filter
    on it prunes at the parquet-partition level, so a probe reads
    nprobe/k_coarse of the on-disk index, never all of it."""
    params = _read_meta(spark, path, "ivfpq")
    fitted = params.get("fitted_rows")
    return IvfPqIndex(
        centroids=spark.read.parquet(f"{path}/centroids"),
        codebooks=spark.read.parquet(f"{path}/codebooks"),
        index=spark.read.parquet(f"{path}/codes"),
        m=int(params["m"]),
        dim=int(params["dim"]),
        k_coarse=int(params["k_coarse"]),
        id_col=str(params["id_col"]),
        fitted_rows=int(fitted) if fitted is not None else None,
    )


def append_ivfpq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
) -> IvfPqIndex:
    """Append new corpus vectors to a persisted IVF-PQ index WITHOUT
    refitting: the rows are encoded against the existing (now possibly
    stale) centroids/codebooks and appended to the partitioned codes
    parquet — an idempotent-per-batch, metadata-cheap ingest step, the
    100 TB append path (re-running Lloyd's on every ingest batch would
    put the O(n·k·iters) fit in the hot path).

    Staleness contract: appended vectors still land in their TRUE nearest
    stale list (encode assigns by exact distance to the existing
    centroids), so probe correctness degrades only through (a) residual
    quantization error growing as the corpus drifts from the trained
    distribution and (b) list occupancy n/k drifting past the ⌈√n⌉ cost
    law.  Both are measured in ``tools/ann_index_probe.py --grown``
    (BENCH_NOTES r13); check ``refit_recommended`` after appends and
    refit when it fires.  Returns the reloaded index."""
    from .ivfpq import encode_ivfpq

    idx = load_ivfpq_index(spark, path)
    codes = encode_ivfpq(
        new_vectors,
        idx.centroids,
        idx.codebooks,
        id_col=idx.id_col,
        vec_col=vec_col,
        m=idx.m,
        dim=idx.dim,
    )
    codes.write.mode("append").partitionBy("centroid_id").parquet(f"{path}/codes")
    return load_ivfpq_index(spark, path)


#: ``refit_recommended`` fires when ⌈√n_now⌉ exceeds this multiple of the
#: fitted k_coarse — i.e. when the corpus has grown past ~factor² × the
#: fitted size and the ⌈√n⌉ sizing law (coarse_k_for) has drifted >2×.
#: Measured basis (tools/ann_index_probe.py --grown, BENCH_NOTES r13):
#: at 2× growth on stale centroids recall@10 holds (the encode step still
#: assigns true nearest lists), while ADC scan cost per probe grows
#: linearly with occupancy n/k — so the trigger is COST-driven at 4×
#: growth, before recall decay becomes the binding constraint.
REFIT_DRIFT_FACTOR = 2.0


def refit_recommended(
    idx: IvfPqIndex,
    current_rows: int | None = None,
    factor: float = REFIT_DRIFT_FACTOR,
) -> bool:
    """True when the corpus has outgrown the fitted coarse quantizer:
    ``coarse_k_for(current_rows) > factor * k_coarse``.  With the ⌈√n⌉
    law this fires at ~factor²× the fitted corpus (4× at the default),
    and never fires below the validation floor where k is pinned.
    ``current_rows`` defaults to a count of the index frame — on a loaded
    index that is a parquet footer-metadata count, not a data scan."""
    from .ivfpq import coarse_k_for

    n = current_rows if current_rows is not None else idx.index.count()
    return coarse_k_for(n) > factor * idx.k_coarse


def ivfpq_probe(
    queries: DataFrame,
    idx: IvfPqIndex,
    corpus: DataFrame | None = None,
    k: int = 10,
    nprobe: int = 4,
    expand: int = 20,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a loaded index — same contract as ``ivfpq_topk`` with the
    trained artifacts supplied by ``load_ivfpq_index``."""
    from .ivfpq import ivfpq_topk

    return ivfpq_topk(
        queries,
        idx.index,
        idx.centroids,
        idx.codebooks,
        corpus=corpus,
        k=k,
        nprobe=nprobe,
        expand=expand,
        query_id=query_id,
        query_vec=query_vec,
        id_col=idx.id_col,
        vec_col=vec_col,
        m=idx.m,
        dim=idx.dim,
    )


# ---------------------------------------------------------------------------
# LSH
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LshIndex:
    buckets: DataFrame  # (<id_col>, bucket, table_idx)
    bits: int
    tables: int
    seed: int
    dim: int
    id_col: str


def save_lsh_index(
    path: str,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """Bucket the corpus once and persist (id, table_idx, bucket),
    partitioned by ``table_idx``.  Hyperplanes are NOT stored — they are
    a pure function of (dim, bits, tables, seed), all recorded in meta,
    so the probe side regenerates them bit-identically."""
    from .similarity import lsh_bucketed

    if dim is None:
        raise ValueError("save_lsh_index requires dim= (lsh_bucketed rationale)")
    bucketed = lsh_bucketed(
        corpus, id_col, vec_col, bits=bits, tables=tables, seed=seed, dim=dim
    ).select(id_col, "table_idx", "bucket")
    bucketed.write.mode("overwrite").partitionBy("table_idx").parquet(
        f"{path}/buckets"
    )
    _write_meta(
        corpus.sparkSession,
        path,
        "lsh",
        {
            "bits": bits,
            "tables": tables,
            "seed": seed,
            "dim": dim,
            "id_col": id_col,
        },
    )


def load_lsh_index(spark: SparkSession, path: str) -> LshIndex:
    params = _read_meta(spark, path, "lsh")
    return LshIndex(
        buckets=spark.read.parquet(f"{path}/buckets"),
        bits=int(params["bits"]),
        tables=int(params["tables"]),
        seed=int(params["seed"]),
        dim=int(params["dim"]),
        id_col=str(params["id_col"]),
    )


def lsh_probe_topk(
    queries: DataFrame,
    idx: LshIndex,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k from a loaded LSH index: bucket the QUERIES with the
    regenerated hyperplanes, join against the persisted corpus buckets
    (ids only move — ``lsh_topk``'s late-materialization shape), then
    exact-score candidates against the source corpus.  Output matches
    ``lsh_topk`` at identical (bits, tables, seed, dim) row-for-row —
    the scoring/rank/round pipeline below mirrors it expression for
    expression."""
    from pyspark.sql import Window

    from ..functions.vector import cosine_similarity
    from .similarity import lsh_bucketed

    corpus_id = idx.id_col
    qb = lsh_bucketed(
        queries,
        query_id,
        vec_col,
        bits=idx.bits,
        tables=idx.tables,
        seed=idx.seed,
        dim=idx.dim,
    ).select(query_id, "table_idx", "bucket")
    cands = (
        qb.join(idx.buckets, ["table_idx", "bucket"])
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
