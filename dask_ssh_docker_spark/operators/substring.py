"""Exact-substring duplicate detection (SURVEY.md §2.H dedup family).

Finds character-level duplicated regions across a document corpus — the
"exact substring dedup" pass of large-scale training-data pipelines
(Lee et al. 2022, *Deduplicating Training Data Makes Language Models
Better*, which uses a suffix array; suffix arrays are inherently
single-machine, so the distributed re-expression here is k-gram
fingerprinting):

1. **gram pass** (map-side): every document emits its length-``k``
   character grams at positions ``1, 1+stride, …`` of the normalized
   text.  With ``stride=1`` this is exact: any substring of length ≥ k
   duplicated anywhere in the corpus is detected.  Only
   ``(gram-key, doc_id, pos)`` tuples leave the scan — with
   ``use_hash=True`` the gram key is a 2×64-bit ``xxhash64`` pair
   (collision odds ~n²/2¹²⁸), so bodies and gram text never shuffle.
2. **dup keys** (one shuffle, map-side combined): ``groupBy(key)``
   keeping keys with ≥ ``min_count`` occurrences corpus-wide.
3. **mark + merge** (one shuffle per doc key): positions of duplicated
   grams per doc collapse into maximal spans with the classic
   gaps-and-islands window (``pos − stride·row_number`` is constant on a
   run of consecutive sampled positions).

At 100 TB the stride-1 gram stream is ~bytes-of-corpus rows; the scale
variant is **winnowing** (Schleimer et al. 2003, the MOSS fingerprint
scheme): per sliding window of ``w`` consecutive gram hashes keep only
the minimum (rightmost on ties), which cuts the shuffled stream ~w× and
still GUARANTEES every common substring of length ≥ k + w − 1 shares a
selected fingerprint, regardless of alignment.  (Naive stride>1 sampling
has no such guarantee — two occurrences can be misaligned modulo the
stride — which is why the sampled path is winnowing, not striding.)
Winnow selection runs as one Arrow-batched ``mapInPandas`` pass (numpy
sliding windows; hash grams JVM-side would re-enter the interpreted-HOF
trap documented in PLANS.md), then reuses the same dup-key/island
machinery.

Reference parity: the reference ships no dedup operators (it is a Dask
deployment harness, SURVEY.md §0); this family is part of the mandated
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

__all__ = [
    "char_gram_positions",
    "substring_duplicate_spans",
    "substring_dup_stats",
    "winnow_fingerprints",
    "winnow_duplicate_spans",
]


def _norm_docs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"), normalize_text(text_col).alias("__t")
    )


def _widen_for_compute(df: DataFrame) -> DataFrame:
    """Gram hashing / winnow selection are compute-dense map stages whose
    INPUT is small in bytes (doc bodies) — scan parallelism follows file
    count, which at bench scale is 1-2 parquet files = 1-2 tasks on 32
    cores.  Widen by doc_id ONLY when the scan is narrower than the
    cluster (one body-sized exchange, trivial next to the gram pass it
    unserializes); a 100 TB scan has thousands of input splits and takes
    the no-op branch, keeping the map stage shuffle-free."""
    width = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, "doc_id")


def char_gram_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    stride: int = 1,
    use_hash: bool = True,
) -> DataFrame:
    """(doc_id, pos, key columns) — length-``k`` character grams of the
    normalized text at stride-sampled positions.  ``use_hash=True`` emits
    ``(h1, h2)`` = xxhash64(gram), xxhash64('#'+gram) instead of the gram
    text (the scale path: fixed 16-byte keys; the '#'-salted second hash
    makes the pair effectively 128-bit)."""
    norm = _widen_for_compute(
        _norm_docs(df, text_col, id_col).where(F.length("__t") >= k)
    )
    pos = norm.select(
        "doc_id",
        "__t",
        F.explode(
            F.sequence(F.lit(1), F.length("__t") - (k - 1), F.lit(stride))
        ).alias("pos"),
    )
    g = F.col("__t").substr(F.col("pos"), F.lit(k))
    if use_hash:
        return pos.select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.xxhash64(g).alias("h1"),
            F.xxhash64(F.concat(F.lit("#"), g)).alias("h2"),
        )
    return pos.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), g.alias("g")
    )


def _spans_from_marks(marked: DataFrame, k: int, stride: int) -> DataFrame:
    """Collapse (doc_id, pos) duplicated-gram marks into maximal spans.
    Consecutive sampled positions (gap == stride) share
    ``pos − stride·row_number`` → one group per island."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = marked.withColumn(
        "grp", F.col("pos") - F.lit(stride) * F.row_number().over(w)
    )
    return (
        islands.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + F.lit(1)).alias("span_len"),
            "n_grams",
        )
    )


def _dup_marks(grams: DataFrame, keys: list[str], min_count: int) -> DataFrame:
    """Positions whose gram key occurs ≥ min_count times corpus-wide.
    groupBy (map-side combined partial counts) + leftsemi back-join —
    two hash-key shuffles, and the gram text/bodies never move.

    Hot-gram safety (probed: tools/skew_probe.py, BENCH_NOTES r10).  The
    count pass is safe on its own — partial_count reduces a hot gram to
    one row per map task.  The back-join is where a boilerplate gram
    holding 20% of the corpus would land 20% of all rows on ONE reducer,
    and AQE's skew split CANNOT fire on the naive plan: OptimizeSkewedJoin
    only matches ``SMJ(Sort(ShuffleStage), Sort(ShuffleStage))``, and the
    dup-keys side carries its count/filter between the Sort and the
    ShuffleStage.  The lazy localCheckpoint below cuts that lineage, so
    the join's right child becomes Sort(Exchange(Scan RDD)) — the
    eligible shape — and AQE splits the hot grams-side partition at
    runtime, only when real skew exists (probe shows ``skew=true`` /
    ``AQEShuffleRead skewed``).  A static 16-way key salt was measured
    first and REJECTED: dup_keys is thin per row but corpus-scaling in
    rows, and replicating it 16× doubled the sf1 wall (23.1 s vs 11.0 s)
    while still capping pathological skew at a fixed 16× instead of
    AQE's as-many-splits-as-needed."""
    dup_keys = (
        grams.groupBy(*keys).agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= min_count)
        .select(*keys)
        .localCheckpoint(eager=False)
    )
    return grams.join(dup_keys, keys, "leftsemi").select("doc_id", "pos")


def substring_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    stride: int = 1,
    min_count: int = 2,
    use_hash: bool = True,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_len, n_grams) — maximal
    duplicated regions: every position whose k-gram occurs ≥ ``min_count``
    times corpus-wide (across documents or repeated within one), merged
    into spans.  ``stride=1`` is exact for substrings of length ≥ k."""
    grams = char_gram_positions(df, text_col, id_col, k, stride, use_hash)
    keys = ["h1", "h2"] if use_hash else ["g"]
    return _spans_from_marks(_dup_marks(grams, keys, min_count), k, stride)


def _merged_intervals(spans: DataFrame) -> DataFrame:
    """(doc_id, s, e) — spans merged into disjoint intervals per doc:
    running-max end, a new group where start exceeds it (spans can
    overlap: islands ≥ stride apart but < k apart both extend k−1 chars
    right)."""
    w_order = Window.partitionBy("doc_id").orderBy("span_start", "span_end")
    prev_max = F.max("span_end").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "__new",
        F.when(
            prev_max.isNull() | (F.col("span_start") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    grouped = flagged.withColumn("__grp", F.sum("__new").over(w_order))
    return grouped.groupBy("doc_id", "__grp").agg(
        F.min("span_start").alias("s"), F.max("span_end").alias("e")
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    stride: int = 1,
    min_count: int = 2,
    use_hash: bool = True,
) -> DataFrame:
    """(doc_id, dup_chars, n_chars, dup_frac) for EVERY document — the
    per-doc duplicated-character fraction, the gating metric pipelines
    threshold on.  Spans can overlap (islands ≥ stride apart but < k
    apart both extend k−1 chars right), so coverage merges intervals
    first: running-max end per doc, a new group where start exceeds it."""
    spans = substring_duplicate_spans(
        df, text_col, id_col, k, stride, min_count, use_hash
    )
    merged = _merged_intervals(spans)
    cov = merged.groupBy("doc_id").agg(
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars")
    )
    base = _norm_docs(df, text_col, id_col).select(
        "doc_id", F.length("__t").cast("long").alias("n_chars")
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            "n_chars",
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 6
            ).alias("dup_frac"),
        )
    )


def substring_excise_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    min_count: int = 2,
    use_hash: bool = True,
) -> DataFrame:
    """(doc_id, clean_text, n_chars, removed_chars) — the corpus-cleaning
    deliverable (Lee et al. 2022's "remove all but one occurrence"): every
    duplicated k-gram occurrence EXCEPT the canonical owner — the
    lexicographically first (doc_id, pos) per gram — is excised from the
    normalized text, so exactly one copy of each duplicated region
    survives corpus-wide.

    Ownership is per gram, so a long shared region resolves to the doc
    carrying its first occurrence; within-doc repeats keep only their
    first occurrence.  Marked occurrences merge to disjoint intervals
    (islands + interval-merge) and the survivor text is rebuilt with one
    JVM ``aggregate`` fold over each doc's (few) intervals — no Python.

    Shape note: owner selection needs a global order within each gram
    key, so this uses ONE window shuffle on the gram-hash key (vs the
    count+semi-join of ``substring_duplicate_spans``); a pathologically
    hot gram (shared boilerplate) concentrates its occurrence list in
    one partition — at 100 TB pre-filter such grams with a df-style
    count cap the way TF-IDF caps stop-terms, or cap with min_count's
    dual (drop grams with > cap occurrences and excise ALL of them:
    boilerplate that common has no meaningful owner)."""
    grams = char_gram_positions(df, text_col, id_col, k, 1, use_hash)
    keys = ["h1", "h2"] if use_hash else ["g"]
    wk = Window.partitionBy(*keys)
    marked = (
        grams.withColumn(
            "__rn",
            F.row_number().over(wk.orderBy("doc_id", "pos")),
        )
        .withColumn("__n", F.count("*").over(wk))
        .where((F.col("__n") >= min_count) & (F.col("__rn") >= 2))
        .select("doc_id", "pos")
    )
    merged = _merged_intervals(_spans_from_marks(marked, k, 1))
    iv = merged.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("__iv")
    )
    base = _norm_docs(df, text_col, id_col)
    joined = base.join(iv, "doc_id", "left")
    rebuilt = F.expr(
        """
        aggregate(
          __iv,
          struct(cast(1 as bigint) as prev, '' as acc),
          (a, x) -> struct(
            x.e + 1 as prev,
            concat(a.acc,
                   substring(__t, cast(a.prev as int),
                             cast(x.s - a.prev as int))) as acc),
          a -> concat(a.acc,
                      substring(__t, cast(a.prev as int),
                                length(__t) - cast(a.prev as int) + 1))
        )
        """
    )
    return joined.select(
        "doc_id",
        F.when(F.col("__iv").isNull(), F.col("__t"))
        .otherwise(rebuilt)
        .alias("clean_text"),
        F.length("__t").cast("long").alias("n_chars"),
        F.coalesce(
            F.aggregate(
                "__iv",
                F.lit(0).cast("long"),
                lambda acc, x: acc + (x["e"] - x["s"] + F.lit(1)),
            ),
            F.lit(0).cast("long"),
        ).alias("removed_chars"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    window: int = 8,
) -> DataFrame:
    """(doc_id, pos, fp, fp2) — winnowed fingerprint selection (Schleimer
    et al. 2003): hash every k-gram, then per sliding window of ``window``
    consecutive hashes keep the minimum (rightmost position on ties —
    the 'robust winnowing' tie-break), de-duplicated per document.

    Selection density → ~2/(window+1) of positions, and any common
    substring of length ≥ k + window − 1 is guaranteed to share a
    selected fingerprint (the guarantee stride sampling lacks).  One
    Arrow-batched map pass, zero shuffle; hashing is numpy-vectorized
    over a byte matrix (64-bit FNV-1a-style poly hash — needs only to be
    deterministic and well-mixed, never compared with xxhash64 paths).

    ``fp2`` is a SECOND polynomial hash over the same gram with an
    independent prime/finalizer: winnow SELECTION keys on ``fp`` alone,
    but duplicate DETECTION matches on the (fp, fp2) pair — 2×64-bit like
    the stride-1 path, because at ~10¹³ fingerprints (the 100 TB corpus
    this path is advertised for) single-64-bit collisions are
    statistically certain and would manufacture false duplicate spans
    (ADVICE r7)."""
    import numpy as np  # noqa: F401  (imported for the closure below)

    id_t = df.schema[id_col].dataType.simpleString()
    norm = _widen_for_compute(
        _norm_docs(df, text_col, id_col).where(F.length("__t") >= k)
    )

    def sel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_id, out_pos, out_fp, out_fp2 = [], [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["__t"]):
                # UTF-32 → one element per CHARACTER, so positions stay
                # char-indexed like the stride-1 path (UTF-8 bytes would
                # drift on any non-ASCII doc)
                b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                n = len(b) - k + 1
                if n < 1:
                    continue
                # 64-bit polynomial rolling-family hash over k-char rows:
                # h[i] = sum b[i+j] * P^(k-1-j) mod 2^64.  Computed in
                # O(n) per prime (r13 optimization round, guide §4) via
                # the prefix form h[i] = P^(k-1+i) · (A[i+k-1] − A[i−1])
                # with A[t] = Σ_{s≤t} b[s]·P^(−s) — P is ODD, hence
                # invertible mod 2^64, so the algebra is EXACT and every
                # value is bit-identical to the former O(n·k)
                # windowed-dot evaluation (numpy uint64 ops wrap mod
                # 2^64 silently; the DuckDB winnow oracle recomputes the
                # same values, pinning the identity).  The former form
                # also materialized an n×k uint64 window copy per doc —
                # the memory traffic, not the multiplies, dominated.
                # Two independent ODD multipliers (odd suffices for a
                # mod-2^64 polynomial hash; P2 is odd-by-construction,
                # not prime): selection keys on h, detection on (h, h2)
                # — collisions must hit BOTH 64-bit spaces
                P, P2, mod = 1099511628211, 0x100000001B3 ^ 0xA5A5A5A5A5A5A5A4, 1 << 64
                bu = b.astype(np.uint64)
                m = len(bu)
                hs = []
                for prime, mix in (
                    (P, 0xFF51AFD7ED558CCD),
                    (P2, 0xC4CEB9FE1A85EC53),
                ):
                    inv = pow(prime, -1, mod)
                    qpow = np.cumprod(
                        np.concatenate(
                            (
                                np.ones(1, dtype=np.uint64),
                                np.full(m - 1, inv, dtype=np.uint64),
                            )
                        ),
                        dtype=np.uint64,
                    )
                    A = np.cumsum(bu * qpow, dtype=np.uint64)
                    D = A[k - 1 :].copy()
                    D[1:] -= A[: n - 1]
                    ppow = np.cumprod(
                        np.concatenate(
                            (
                                np.full(1, pow(prime, k - 1, mod), dtype=np.uint64),
                                np.full(n - 1, prime, dtype=np.uint64),
                            )
                        ),
                        dtype=np.uint64,
                    )
                    hh = ppow * D
                    hh ^= hh >> np.uint64(33)  # finalize: mix high bits down
                    hh = hh * np.uint64(mix)
                    hh ^= hh >> np.uint64(33)
                    hs.append(hh)
                h, h2 = hs
                if n <= window:
                    idx = np.array([n - 1 - h[::-1].argmin()])
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(h, window)
                    # rightmost argmin per window
                    rel = window - 1 - sw[:, ::-1].argmin(axis=1)
                    idx = np.unique(rel + np.arange(len(sw)))
                out_id.extend([doc_id] * len(idx))
                out_pos.extend((idx + 1).tolist())  # 1-based positions
                out_fp.extend(h[idx].astype(np.int64).tolist())
                out_fp2.extend(h2[idx].astype(np.int64).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id),
                    "pos": pd.Series(out_pos, dtype="int64"),
                    "fp": pd.Series(out_fp, dtype="int64"),
                    "fp2": pd.Series(out_fp2, dtype="int64"),
                }
            )

    return norm.mapInPandas(
        sel, schema=f"doc_id {id_t}, pos long, fp long, fp2 long"
    )


def winnow_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 40,
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Duplicate spans from winnowed fingerprints — the 100 TB shape:
    ~window×-fewer tuples shuffle than stride-1, with the ≥ k+window−1
    detection guarantee.  Islands merge with gap tolerance = window+k−1
    (selected positions of one duplicated region can be up to ``window``
    apart, and each gram covers k chars), so ``span_len`` bounds the
    duplicated region from below/above rather than exactly."""
    # lazy lineage cut: the dup-key groupBy AND the semi-join both consume
    # the fingerprint frame — without the cut the Python selection pass
    # runs twice over the corpus.  (The stride-1 path deliberately does
    # NOT materialize its gram stream: grams are cheap JVM recompute from
    # the scan, and caching ~bytes-of-corpus rows would cost more than
    # the second map pass.)
    fps = winnow_fingerprints(df, text_col, id_col, k, window).localCheckpoint(
        eager=False
    )
    marked = _dup_marks(
        fps.withColumnRenamed("fp", "h1").withColumnRenamed("fp2", "h2"),
        ["h1", "h2"],  # 2×64-bit key, same collision posture as stride-1
        min_count,
    )
    gap = window + k - 1
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    grouped = marked.withColumn(
        "__new",
        F.when(prev.isNull() | (F.col("pos") - prev > gap), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("__grp", F.sum("__new").over(w))
    return (
        grouped.groupBy("doc_id", "__grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_fps"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + F.lit(1)).alias("span_len"),
            "n_fps",
        )
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
