"""Distribution-comparison tests (SURVEY.md §2.H extension): the
two-sample readouts an experimentation / drift-monitoring pipeline runs
over event streams — a binned Kolmogorov-Smirnov statistic, an exact
Mann-Whitney U (rank-sum) test with tie correction, a Population
Stability Index drift audit, and a Benford first-digit anomaly screen.

Determinism doctrine (``_util.py``): every cross-row accumulation is
integer or exact-decimal (order-independent in both engines); the
closed-form double arithmetic that follows is the identical IEEE op tree
on identical inputs, so Spark and DuckDB agree bitwise before the final
display rounding.  ``ln``/``log10`` may differ by 1 ulp between libm and
the JVM; every logarithm here feeds a ``round(…, 4..6)`` that absorbs it
(same policy as the entropy / bigram-LM / BM25 queries).

Scale notes are inline per query; the common theme: the *distribution*
is reduced to a bounded summary (fixed bins, distinct quantized values,
first digits) with one map-side shuffle, and only the bounded summary
ever passes through an ordered window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# KS: fixed-width bins over the known metric range [0, 512) — 2.0-wide →
# ≤256 bins.  Binning turns the inherently ordered CDF pass into a
# ≤256-row window regardless of corpus size (the production shape for a
# KS readout at 100 TB; exact KS needs a global sort by value).
_KS_BIN_W = 2.0


@query(
    "ks_binned_click_view",
    oracle=f"""
    WITH s AS (
      SELECT CAST(floor(value / {_KS_BIN_W}) AS BIGINT) AS bin,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'view')
    ),
    b AS (
      SELECT bin, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM s GROUP BY bin
    ),
    c AS (
      SELECT SUM(ca) OVER (ORDER BY bin) AS cuma,
             SUM(cb) OVER (ORDER BY bin) AS cumb,
             SUM(ca) OVER () AS na,
             SUM(cb) OVER () AS nb
      FROM b
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_click,
           CAST(MAX(nb) AS BIGINT) AS n_view,
           round(MAX(abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                         - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE))), 6)
             AS ks_d
    FROM c
    """,
)
def ks_binned_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov D between the ``value``
    distributions of *click* vs *view* events: D = max over bins of
    |CDF_click − CDF_view| on a fixed 2.0-wide grid (bin-width bounds the
    estimate's error vs exact KS by the max within-bin CDF slope; the
    grid is what makes the statistic computable without a global sort).

    Determinism: cumulative counts are integers; each CDF value is one
    integer/integer IEEE division; max over identical doubles.

    Scale: one map-side groupBy onto ≤256 bins, then an ordered window
    over ≤256 rows — constant-size post-shuffle work at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.floor(F.col("value") / _KS_BIN_W).cast("bigint").alias("bin"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ia"),
    )
    b = s.groupBy("bin").agg(
        F.sum("ia").alias("ca"), F.sum(F.lit(1) - F.col("ia")).alias("cb")
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = b.select(
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return c.agg(
        F.max("na").cast("bigint").alias("n_click"),
        F.max("nb").cast("bigint").alias("n_view"),
        F.round(
            F.max(
                F.abs(
                    F.col("cuma").cast("double") / F.col("na").cast("double")
                    - F.col("cumb").cast("double") / F.col("nb").cast("double")
                )
            ),
            6,
        ).alias("ks_d"),
    )


@query(
    "mannwhitney_click_view",
    oracle="""
    WITH s AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('click', 'view')
    ),
    b AS (
      SELECT value, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM s GROUP BY value
    ),
    c AS (
      SELECT ca, cb, SUM(cb) OVER (ORDER BY value) - cb AS cumb_less
      FROM b
    ),
    t AS (
      SELECT SUM(2 * ca * cumb_less + ca * cb) AS two_u,
             SUM(ca) AS na, SUM(cb) AS nb,
             SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS tie_term
      FROM c
    )
    SELECT CAST(na AS BIGINT) AS n_click,
           CAST(nb AS BIGINT) AS n_view,
           CAST(two_u AS DOUBLE) / 2.0 AS u_click,
           round((CAST(two_u AS DOUBLE) / 2.0
                  - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
                 / sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                        * (CAST(na + nb + 1 AS DOUBLE)
                           - CAST(tie_term AS DOUBLE)
                             / (CAST(na + nb AS DOUBLE)
                                * CAST(na + nb - 1 AS DOUBLE)))), 6)
             AS z_score
    FROM t
    """,
)
def mannwhitney_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (rank-sum) test, click vs view ``value``:
    U_click counted from per-distinct-value group counts —
    ``U = Σ_v ca(v)·(cb_less(v) + cb(v)/2)`` (kept as the integer ``2U``
    until the end) — with the normal-approximation z-score including the
    standard tie correction ``Σ(t³−t)/(n(n−1))``.

    Determinism: 2U and the tie term are exact integers; the z-score is
    a fixed IEEE op tree (sqrt is correctly rounded by IEEE 754 in both
    engines), with 6-decimal display rounding.

    Scale: one groupBy per distinct metric value, then the below-value
    view-count prefix comes from the distributed running-sum
    decomposition (``operators/ranking.py`` — sketch-bucketed cumsum
    with broadcast offsets), so even an unbounded distinct-value grain
    never hits a single-partition ordered window (the r4 scale-killer;
    plan-asserted in tests/test_plans.py)."""
    from ..operators.ranking import with_global_running_sum

    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "view")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ia"),
    )
    b = s.groupBy("value").agg(
        F.sum("ia").alias("ca"), F.sum(F.lit(1) - F.col("ia")).alias("cb")
    ).localCheckpoint(eager=False)  # grain cut: the eager sketch would re-run the agg
    c = with_global_running_sum(
        b, [("value", True)], "cb", out="__cumb"
    ).select(
        "ca",
        "cb",
        (F.col("__cumb") - F.col("cb")).alias("cumb_less"),
    )
    t = c.agg(
        F.sum(
            2 * F.col("ca") * F.col("cumb_less") + F.col("ca") * F.col("cb")
        ).alias("two_u"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        ).alias("tie_term"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    u = F.col("two_u").cast("double") / 2.0
    n = F.col("na") + F.col("nb")
    sigma = F.sqrt(
        (na * nb / 12.0)
        * (
            (n + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    return t.select(
        F.col("na").cast("bigint").alias("n_click"),
        F.col("nb").cast("bigint").alias("n_view"),
        u.alias("u_click"),
        F.round((u - na * nb / 2.0) / sigma, 6).alias("z_score"),
    )


# PSI: fixed 50k-wide price bins (10 lanes over [0, 500k]); split at a
# fixed date boundary.  Laplace +1 smoothing keeps every observed bin's
# ratio finite on both sides.
_PSI_BIN_W = 50000.0
_PSI_NBINS = 10
_PSI_SPLIT = "1998-01-01"


@query(
    "psi_price_drift",
    oracle=f"""
    WITH s AS (
      SELECT LEAST(CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT),
                   {_PSI_NBINS - 1}) AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}'
                  THEN 1 ELSE 0 END AS early
      FROM orders
    ),
    b AS (
      SELECT bin, SUM(early) AS ce, SUM(1 - early) AS cl FROM s GROUP BY bin
    ),
    tot AS (SELECT SUM(ce) AS ne, SUM(cl) AS nl FROM b)
    SELECT bin,
           CAST(ce AS BIGINT) AS n_early,
           CAST(cl AS BIGINT) AS n_late,
           round((CAST(ce + 1 AS DOUBLE) / CAST(ne + {_PSI_NBINS} AS DOUBLE)
                  - CAST(cl + 1 AS DOUBLE) / CAST(nl + {_PSI_NBINS} AS DOUBLE))
                 * ln((CAST(ce + 1 AS DOUBLE)
                       / CAST(ne + {_PSI_NBINS} AS DOUBLE))
                      / (CAST(cl + 1 AS DOUBLE)
                         / CAST(nl + {_PSI_NBINS} AS DOUBLE))), 6)
             AS psi_term
    FROM b CROSS JOIN tot
    """,
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift audit of the order-price
    distribution across a date split (pre/post 1998-01-01): per fixed
    price bin, the PSI contribution ``(p−q)·ln(p/q)`` with Laplace +1/bin
    smoothing (the standard scorecard-monitoring drift metric; Σ terms
    > 0.2 conventionally flags a shifted distribution).

    Determinism: bin counts are integers; p and q are single IEEE
    divisions; ``ln`` ulp absorbed by round-6.

    Scale: one map-side groupBy onto 10 fixed bins + a 1-row totals
    broadcast — constant post-shuffle work at any history length."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BIN_W).cast("bigint"),
            F.lit(_PSI_NBINS - 1),
        ).alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("early"),
    )
    b = s.groupBy("bin").agg(
        F.sum("early").alias("ce"),
        F.sum(F.lit(1) - F.col("early")).alias("cl"),
    )
    tot = b.agg(F.sum("ce").alias("ne"), F.sum("cl").alias("nl"))
    pe = (F.col("ce") + 1).cast("double") / (
        F.col("ne") + _PSI_NBINS
    ).cast("double")
    pl = (F.col("cl") + 1).cast("double") / (
        F.col("nl") + _PSI_NBINS
    ).cast("double")
    return b.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("ce").cast("bigint").alias("n_early"),
        F.col("cl").cast("bigint").alias("n_late"),
        F.round((pe - pl) * F.log(pe / pl), 6).alias("psi_term"),
    )


@query(
    "benford_price_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders
    ),
    tot AS (SELECT COUNT(*) AS n FROM d)
    SELECT digit,
           COUNT(*) AS n_obs,
           round(CAST(n AS DOUBLE)
                 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS n_expected
    FROM d CROSS JOIN tot
    GROUP BY digit, n
    """,
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit screen over order totals:
    observed count per leading digit vs the Benford expectation
    ``n·log10(1 + 1/d)`` — the classic fabricated-numbers /
    data-corruption audit for financial measures.

    The leading digit comes from the DECIMAL(12,2) string form (identical
    formatting in both engines; prices ≥ 1 so the first character is
    always a significant digit — no sign/zero/exponent cases).

    Scale: map-side digit extraction, groupBy onto ≤9 rows, 1-row total
    broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            F.round(
                F.col("n").cast("double")
                * F.log10(1.0 + 1.0 / F.col("digit").cast("double")),
                4,
            ).alias("n_expected"),
        )
    )
