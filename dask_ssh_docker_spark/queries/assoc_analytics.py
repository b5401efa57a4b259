"""Wave-9 analytics: pointwise mutual information between co-occurring
terms, and per-user event inter-arrival statistics (rate + regularity).

Determinism doctrine as elsewhere: co-occurrence and document-frequency
counts are integers; PMI's ``ln`` feeds a round-6 (established policy);
inter-arrival moments accumulate as exact integer microseconds with the
closed-form variance (no ``stddev`` accumulation-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

_PMI_MIN_DF = 5
_PMI_TOPK = 25


@query(
    "text_pmi_cooccurrence",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
    ),
    pres AS (
      SELECT DISTINCT doc_id, unnest(toks) AS term FROM base
    ),
    df_ AS (
      SELECT term, COUNT(*) AS c FROM pres GROUP BY term
      HAVING COUNT(*) >= {_PMI_MIN_DF}
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM base),
    pairs AS (
      SELECT a.term AS t1, b.term AS t2, COUNT(*) AS c12
      FROM pres a JOIN pres b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    ),
    scored AS (
      SELECT t1, t2, c12, d1.c AS c1, d2.c AS c2,
             round(ln(CAST(n_docs AS DOUBLE) * CAST(c12 AS DOUBLE)
                      / (CAST(d1.c AS DOUBLE) * CAST(d2.c AS DOUBLE))), 6)
               AS pmi
      FROM pairs
      JOIN df_ d1 ON d1.term = pairs.t1
      JOIN df_ d2 ON d2.term = pairs.t2
      CROSS JOIN n
    )
    SELECT t1, t2, c12, c1, c2, pmi
    FROM scored
    ORDER BY pmi DESC, t1, t2 LIMIT {_PMI_TOPK}
    """,
)
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 term pairs by pointwise mutual information over document
    co-occurrence: ``PMI(a,b) = ln(N·c_ab / (c_a·c_b))`` on
    presence-per-doc counts, terms filtered to df ≥ 5 — the
    collocation / topic-affinity readout (high PMI = terms appearing
    together far above chance).

    Determinism: all counts integers; one ``ln`` under round-6; top-k
    tie-broken on the pair itself.

    Scale: presence pairs expand WITHIN each doc (bounded by per-doc
    distinct-term count squared — the copurchase shape, never a
    vocab×vocab matrix); the df table joins back un-hinted (AQE
    broadcasts a small vocabulary, shuffle-joins a web-scale one);
    top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "
        ).alias("t"),
    )
    pres = toks.select("doc_id", F.explode("t").alias("term")).distinct()
    dfreq = (
        pres.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _PMI_MIN_DF)
    )
    n = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    a = pres.select("doc_id", F.col("term").alias("t1"))
    b = pres.select("doc_id", F.col("term").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    scored = (
        pairs.join(
            dfreq.select(F.col("term").alias("t1"), F.col("c").alias("c1")),
            "t1",
        )
        .join(
            dfreq.select(F.col("term").alias("t2"), F.col("c").alias("c2")),
            "t2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    F.col("n_docs").cast("double") * F.col("c12").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "t1", "t2").limit(_PMI_TOPK)


@query(
    "interarrival_stats_per_user",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events
    ),
    m AS (
      SELECT user_id, COUNT(gap_us) AS n_gaps,
             SUM(gap_us) AS sx,
             SUM(CAST(gap_us AS HUGEINT) * CAST(gap_us AS HUGEINT)) AS sxx
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           CAST(sx AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1000000.0
             AS mean_gap_s,
           sqrt((CAST(n_gaps AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps - 1 AS DOUBLE)))
             / (CAST(sx AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS gap_cv
    FROM m WHERE n_gaps >= 2
    """,
)
def interarrival_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event inter-arrival statistics: mean gap (seconds) and
    the coefficient of variation — the burstiness fingerprint (CV ≈ 1 ⇒
    Poisson arrivals; CV ≫ 1 ⇒ bursty bot-like traffic; CV ≪ 1 ⇒
    scheduled/heartbeat).  The behavioral-segmentation feature next to
    ``decayed_user_activity``.

    Determinism: gaps are exact integer microseconds; Σx is an exact
    bigint; Σx² accumulates in exact DECIMAL (a squared multi-day gap in
    µs overflows int64); variance comes from the closed form
    ``(nΣx² − (Σx)²)/(n(n−1))`` — one identical IEEE expression tree —
    not from accumulation-order-dependent ``stddev``; sqrt is IEEE-exact;
    mean and CV are emitted UNROUNDED (bit-identical by construction —
    a round-6 at 1e6-second magnitudes is the engine-divergent step).

    Scale: one user-keyed lag window + one grouped moment aggregation —
    the same single exchange as every per-user window query."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    g14 = F.col("gap_us").cast("decimal(14,0)")
    m = gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").alias("sx"),
        F.sum(g14 * g14).alias("sxx"),
    ).filter(F.col("n_gaps") >= 2)
    nd = F.col("n_gaps").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean_us = sx / nd
    sd = F.sqrt((nd * sxx - sx * sx) / (nd * (F.col("n_gaps") - 1).cast("double")))
    return m.select(
        "user_id",
        "n_gaps",
        (mean_us / 1000000.0).alias("mean_gap_s"),
        (sd / mean_us).alias("gap_cv"),
    )
