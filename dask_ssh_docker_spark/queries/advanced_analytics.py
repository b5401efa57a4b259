"""Wave-6 analytics: changepoint detection (CUSUM), calendar
seasonality, week-over-week growth, bitmap-exact distinct counting,
hash-seeded Poisson-bootstrap confidence intervals, the Gopher
top-n-gram repetition metric, and robust (median/IQR) feature scaling.

Determinism doctrine (``_util.py``): cross-row accumulation in exact
integer/decimal (CUSUM keeps its running statistic as ``n·Σ_{i≤t} − t·S``
— pure decimal×integer — so even the argmax flag is integer-exact);
bootstrap resampling weights come from md5 (never ``rand()``), making the
"random" replicas bit-reproducible across engines, partitionings, and
reruns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# ---------------------------------------------------------------------------
# CUSUM changepoint over daily revenue
# ---------------------------------------------------------------------------


@query(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    c AS (
      SELECT day, s,
             CAST(SUM(s) OVER (ORDER BY day) AS DECIMAL(18,2)) AS cum,
             CAST(SUM(s) OVER () AS DECIMAL(18,2)) AS tot,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    k AS (
      SELECT day, s, n,
             cum * CAST(n AS DECIMAL(6,0)) - CAST(t AS DECIMAL(6,0)) * tot
               AS cusum_scaled
      FROM c
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(s AS DOUBLE) AS daily_rev,
           round(CAST(cusum_scaled AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS cusum_m,
           abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER () AS is_peak
    FROM k
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily-revenue series: the running
    cumulative deviation from the series mean,
    ``CUSUM_t = Σ_{i≤t}(y_i − ȳ)``, whose |max| marks the most likely
    mean-shift point (the classic offline CUSUM estimator).  ``is_peak``
    flags the argmax row(s).

    Determinism: computed as the scaled integer-decimal form
    ``n·(Σ_{i≤t} y_i) − t·Σy`` — exact DECIMAL×INTEGER arithmetic — so
    the peak comparison is exact (no float argmax flakiness).  The
    surfaced statistic is in revenue MILLIONS (``cusum_m``): at sf1 the
    raw CUSUM is ~1e8, where a 6-decimal display round is
    engine-divergent (``round(x,6)`` multiplies into the 1e14 range and
    the two engines' rounding paths disagree in the last digit —
    measured); at the million scale the round-6 grid is ~1e11× coarser
    than an input ulp, so it can never flip.

    Scale: day-grain aggregation first (one shuffle); the ordered scan
    runs over the bounded daily summary (~2.4k rows for 6.5 years), not
    the raw orders."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("s"))
    wo = Window.orderBy("day")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = daily.select(
        "day",
        "s",
        F.sum("s")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(18,2)")
        .alias("cum"),
        F.sum("s").over(wall).cast("decimal(18,2)").alias("tot"),
        F.row_number().over(wo).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    k = c.select(
        "day",
        "s",
        "n",
        (
            F.col("cum") * F.col("n").cast("decimal(6,0)")
            - F.col("t").cast("decimal(6,0)") * F.col("tot")
        ).alias("cusum_scaled"),
    )
    return k.select(
        # timestamp at the boundary: DateType is banned from driver-visible
        # output (tests/test_schema_policy.py)
        F.col("day").cast("timestamp").alias("day"),
        F.col("s").cast("double").alias("daily_rev"),
        F.round(
            F.col("cusum_scaled").cast("double")
            / F.col("n").cast("double")
            / 1000000.0,
            6,
        ).alias("cusum_m"),
        (
            F.abs(F.col("cusum_scaled"))
            == F.max(F.abs(F.col("cusum_scaled"))).over(wall)
        ).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# Calendar seasonality + week-over-week growth
# ---------------------------------------------------------------------------


@query(
    "seasonality_dow_index",
    oracle="""
    WITH d AS (
      SELECT isodow(o_orderdate) - 1 AS weekday_mon0,
             CAST(o_totalprice AS DECIMAL(12,2)) AS y
      FROM orders
    ),
    g AS (
      SELECT weekday_mon0,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS avg_dow,
             COUNT(*) AS n_orders
      FROM d GROUP BY weekday_mon0
    ),
    a AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS avg_all FROM d)
    SELECT weekday_mon0, n_orders,
           avg_dow AS avg_order_value,
           avg_dow / avg_all AS seasonal_index
    FROM g CROSS JOIN a
    """,
)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of order value: mean order value per
    weekday divided by the overall mean — the multiplicative seasonal
    factor used for calendar normalization before
    forecasting/anomaly-scoring (index ≈ 1 everywhere ⇒ no weekly
    seasonality).  Weekday is Monday=0 (pandas convention; Spark
    ``weekday`` = DuckDB ``isodow − 1``).

    Determinism: exact-decimal sums; each mean is one IEEE division; the
    index one more — both emitted UNROUNDED (bit-identical op trees;
    display rounding at 1e5 magnitude is the engine-divergent step, not
    the arithmetic).

    Scale: map-side groupBy onto 7 rows + a 1-row global broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(12,2)")
    d = orders.select(F.weekday("o_orderdate").alias("weekday_mon0"), y.alias("y"))
    g = d.groupBy("weekday_mon0").agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("avg_dow"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    a = d.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("avg_all")
    )
    return g.crossJoin(F.broadcast(a)).select(
        "weekday_mon0",
        "n_orders",
        F.col("avg_dow").alias("avg_order_value"),
        (F.col("avg_dow") / F.col("avg_all")).alias("seasonal_index"),
    )


@query(
    "wow_growth_weekly",
    oracle="""
    WITH w AS (
      SELECT date_trunc('week', o_orderdate) AS week,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY date_trunc('week', o_orderdate)
    ),
    l AS (
      SELECT week, rev, LAG(rev) OVER (ORDER BY week) AS prev
      FROM w
    )
    SELECT CAST(week AS TIMESTAMP) AS week,
           CAST(rev AS DOUBLE) AS revenue,
           round((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
                 / CAST(prev AS DOUBLE), 6) AS wow_growth
    FROM l
    """,
)
def wow_growth_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth: weekly exact-decimal totals with a
    1-week lag ratio (Monday-start weeks — Spark and DuckDB agree on
    ``date_trunc('week')``).  First week's growth is NULL (no prior).

    Scale: one shuffle to week grain; the lag window runs over the
    bounded weekly summary (~350 rows for 6.5 years)."""
    orders = load_table(spark, sf_dir, "orders")
    w = orders.groupBy(
        F.date_trunc("week", "o_orderdate").alias("week")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"))
    lw = Window.orderBy("week")
    l = w.select("week", "rev", F.lag("rev").over(lw).alias("prev"))
    return l.select(
        F.col("week").cast("timestamp").alias("week"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev").cast("double") - F.col("prev").cast("double"))
            / F.col("prev").cast("double"),
            6,
        ).alias("wow_growth"),
    )


# ---------------------------------------------------------------------------
# Bitmap-exact distinct counting
# ---------------------------------------------------------------------------


@query(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via roaring-style bitmap
    partial aggregation (``bitmap_construct_agg`` over per-bucket bit
    positions, then summed bitmap popcounts) — the scalable exact
    alternative to ``COUNT(DISTINCT)``'s row shuffle: the shuffle carries
    one ≤4 KiB bitmap per (group, 32k-id bucket) instead of one row per
    distinct id, and bitmaps OR-merge associatively (partial aggregation
    applies).  HLL (``rollup_cascade_daily_hll``) is the approximate
    sibling; this is the exact one.

    Oracle: plain ``COUNT(DISTINCT)`` — same answer by construction."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    return (
        b.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Hash-seeded Poisson bootstrap CI
# ---------------------------------------------------------------------------

_BOOT_B = 50
# Poisson(1) CDF thresholds (weight k for u in [c_{k-1}, c_k)), capped at 6.
_POIS_CDF = []
_acc = 0.0
for _k in range(7):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)
# 2^16: each md5 yields EIGHT 4-hex-digit lanes → uniform [0,1) at 16-bit
# resolution.  16 bits quantize the Poisson CDF inversion by ≤1.5e-5 per
# draw — identically in BOTH engines (same integer parse, same double
# divide, same literal thresholds), so replicas stay bit-identical; the
# statistical perturbation is ~1e-5 absolute on branch probabilities,
# noise for a bootstrap CI.  r9 (VERDICT item 6): 4→8 lanes halves the
# md5 count per row (the dominant per-row cost of the ×B expansion).
_U_SCALE = 65536.0


def _boot_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE{branches} ELSE 7 END"


@query(
    "bootstrap_ci_revenue",
    oracle=f"""
    WITH r AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS y,
             unnest(generate_series(0, {(_BOOT_B + 7) // 8 - 1})) AS g
      FROM orders
    ),
    h AS (
      SELECT y, g,
             md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(g AS VARCHAR))
               AS hh
      FROM r
    ),
    u AS (
      SELECT y, g * 8 + lane AS b,
             CAST(('0x' || substr(hh, 1 + 4 * lane, 4)) AS BIGINT)
               / {_U_SCALE!r} AS uu
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS lane)
      WHERE g * 8 + lane < {_BOOT_B}
    ),
    w AS (
      SELECT y, b, {_boot_case_sql('uu')} AS wt FROM u
    ),
    m AS (
      SELECT b,
             CAST(SUM(y * wt) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE)
               AS mean_b
      FROM w GROUP BY b
    ),
    ranked AS (
      SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rnk FROM m
    ),
    point AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS point_mean
      FROM orders
    )
    SELECT {_BOOT_B} AS n_replicates,
           MAX(point_mean) AS point_mean,
           MAX(CASE WHEN rnk = 2 THEN mean_b END) AS ci_lo,
           MAX(CASE WHEN rnk = {_BOOT_B - 1} THEN mean_b END) AS ci_hi
    FROM ranked CROSS JOIN point
    """,
)
def bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value:
    50 resampling replicas where each row's multiplicity in replica *b*
    is Poisson(1)-distributed — drawn DETERMINISTICALLY by inverting the
    Poisson CDF on an md5(row‖b) uniform (never ``rand()``: replicas are
    bit-identical across engines, partitionings, and reruns).  The CI is
    the [2nd, 49th] order statistics of the replica means (~4%/96%).
    Poisson bootstrap is *the* distributed bootstrap: no global resample
    pass, each row weighs itself independently (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012).

    Determinism: weights are integers from literal CDF thresholds
    (repr-interpolated, bitwise identical); replica sums are exact
    DECIMAL; one IEEE division per replica — emitted UNROUNDED (the
    quotient doubles are bit-identical; a 6-decimal display round at
    1e5 magnitude is the engine-divergent step); order statistics break
    ties on replica id.

    Scale: map-side ×B row expansion (B=50 constant) feeding one 50-group
    aggregation — shuffle volume is B partial sums per partition, the
    same shape as q1 — then a 50-row window."""
    orders = load_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(12,2)")
    # one md5 feeds EIGHT replicas (4 hex digits / 16 bits each of the
    # 32): the md5 is the dominant per-row cost of the ×B expansion, so
    # hashing per replica GROUP instead of per replica is a direct
    # multiplier on it (r8: 1→4 lanes, sf1 75 s → ~20 s; r9: 4→8 lanes —
    # see _U_SCALE for the 16-bit resolution argument); the oracle
    # derives the identical lanes
    n_groups = (_BOOT_B + 7) // 8
    r = orders.select(
        "o_orderkey",
        y.alias("y"),
        F.explode(F.sequence(F.lit(0), F.lit(n_groups - 1))).alias("g"),
    ).select(
        "y",
        "g",
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit("|"),
                F.col("g").cast("string"),
            )
        ).alias("hh"),
    )
    r = (
        r.select(
            "y",
            "g",
            "hh",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("lane"),
        )
        .filter(F.col("g") * 8 + F.col("lane") < _BOOT_B)
        .select(
            "y",
            (F.col("g") * 8 + F.col("lane")).alias("b"),
            F.substring(
                "hh", F.lit(1) + F.col("lane") * 4, F.lit(4)
            ).alias("__hx"),
        )
    )
    uu = F.conv("__hx", 16, 10).cast("bigint") / F.lit(_U_SCALE)
    wt = F.lit(7)
    for k in range(6, -1, -1):
        wt = F.when(F.col("uu") < F.lit(_POIS_CDF[k]), k).otherwise(wt)
    w = r.select("y", "b", uu.alias("uu")).select(
        "y", "b", wt.alias("wt")
    )
    m = w.groupBy("b").agg(
        (
            F.sum(F.col("y") * F.col("wt")).cast("double")
            / F.sum("wt").cast("double")
        ).alias("mean_b")
    )
    ranked = m.select(
        "mean_b",
        F.row_number().over(Window.orderBy("mean_b", "b")).alias("rnk"),
    )
    point = orders.agg(
        (F.sum(y).cast("double") / F.count(F.lit(1))).alias("point_mean")
    )
    return ranked.crossJoin(F.broadcast(point)).agg(
        F.lit(_BOOT_B).alias("n_replicates"),
        F.max("point_mean").alias("point_mean"),
        F.max(F.when(F.col("rnk") == 2, F.col("mean_b"))).alias("ci_lo"),
        F.max(F.when(F.col("rnk") == _BOOT_B - 1, F.col("mean_b"))).alias(
            "ci_hi"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher repetition metric: top-bigram coverage
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


@query(
    "text_top_bigram_coverage",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
    ),
    big AS (
      SELECT doc_id, len(toks) AS dl,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1]))
               AS bg
      FROM base WHERE len(toks) >= 2
    ),
    cnt AS (
      SELECT doc_id, dl, bg, COUNT(*) AS c FROM big GROUP BY doc_id, dl, bg
    ),
    m AS (SELECT doc_id, dl, MAX(c) AS mc FROM cnt GROUP BY doc_id, dl)
    SELECT doc_id,
           CAST(mc AS BIGINT) AS top_bigram_n,
           round(2.0 * CAST(mc AS DOUBLE) / CAST(dl AS DOUBLE), 6)
             AS top_bigram_coverage
    FROM m
    """,
)
def text_top_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metric (Rae et al. 2021 §A1.1): per
    document, the fraction of tokens covered by its single most frequent
    bigram (``2·max_count/n_tokens``, overlap-naive) — high values flag
    degenerate repeated-phrase documents that the quality gate should
    drop.  Complements ``text_dup_sentence_fraction`` (sentence-level)
    and ``text_gopher_quality`` (lexical ratios).

    Scale: bigrams explode map-side with the doc id, one (doc, bigram)
    aggregation, one per-doc max — no windows, no cross-doc state; only
    the max count (not the bigram text) survives the second shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "), " "
        ).alias("t"),
    ).filter(F.size("t") >= 2)
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    big = toks.select(
        "doc_id", F.size("t").alias("dl"), F.explode(pairs).alias("bg")
    )
    cnt = big.groupBy("doc_id", "dl", "bg").agg(F.count(F.lit(1)).alias("c"))
    m = cnt.groupBy("doc_id", "dl").agg(F.max("c").alias("mc"))
    return m.select(
        "doc_id",
        F.col("mc").cast("bigint").alias("top_bigram_n"),
        F.round(
            2.0 * F.col("mc").cast("double") / F.col("dl").cast("double"), 6
        ).alias("top_bigram_coverage"),
    )


# ---------------------------------------------------------------------------
# Robust (median/IQR) scaling
# ---------------------------------------------------------------------------


@query(
    "feature_robust_scale",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             percentile_cont(0.25) WITHIN GROUP
               (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p25,
             percentile_cont(0.5) WITHIN GROUP
               (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p50,
             percentile_cont(0.75) WITHIN GROUP
               (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p75
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority,
           round((CAST(o_totalprice AS DOUBLE) - p50) / (p75 - p25), 6)
             AS robust_scaled
    FROM orders o JOIN q ON o.o_orderpriority = q.o_orderpriority
    """,
)
def feature_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-category feature scaling ``(y − median)/IQR`` — the
    outlier-resistant sibling of ``feature_minmax_scale`` (sklearn
    RobustScaler semantics): median centers, interquartile range scales,
    so a single 10⁶× outlier cannot collapse the feature.

    Determinism: both engines implement SQL ``percentile_cont`` linear
    interpolation on sorted doubles (hash-matched precedent:
    ``group_quantiles_exact``); the scale expression is one subtraction
    + one division per row.

    Scale: one 5-row quantile aggregate joined back unhinted (AQE
    broadcasts it); exact per-group percentiles need a per-group sort —
    at extreme group cardinality swap in ``approx_percentile`` partials
    (documented in SCALE.md)."""
    orders = load_table(spark, sf_dir, "orders")
    yd = F.col("o_totalprice").cast("double")
    # one array-percentile aggregate: one sorted buffer per group, not
    # three (group_quantiles_exact note)
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile(
            yd, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("__p")
    ).select(
        "o_orderpriority",
        F.col("__p")[0].alias("p25"),
        F.col("__p")[1].alias("p50"),
        F.col("__p")[2].alias("p75"),
    )
    return orders.join(q, "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.round((yd - F.col("p50")) / (F.col("p75") - F.col("p25")), 6).alias(
            "robust_scaled"
        ),
    )


# ---------------------------------------------------------------------------
# Conversion latency (first view → first subsequent purchase)
# ---------------------------------------------------------------------------


@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT (epoch_us(fp.first_purchase) - epoch_us(fv.first_view)) AS us
      FROM fv JOIN fp ON fv.user_id = fp.user_id
    )
    SELECT COUNT(*) AS n_converted,
           CAST(SUM(us) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_latency_s,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY us) / 1000000.0
             AS p50_latency_s,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY us) / 1000000.0
             AS p90_latency_s
    FROM lat
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, the latency from first
    *view* to the first *purchase* at-or-after it; mean/p50/p90 over
    converting users — the funnel-health readout next to
    ``funnel_view_click_purchase`` (which counts stage reach, not time).

    Determinism: latencies are exact integer microseconds;
    ``percentile_cont`` interpolates on those integers identically in
    both engines; the mean and the µs→s conversions are mirrored
    divisions.

    Scale: two user-keyed aggregations + one user join, all
    co-partitioned on user_id after the first exchange; the quantile is
    a 1-row global aggregate."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = fv.join(fp, "user_id").select(
        (
            F.unix_micros("first_purchase") - F.unix_micros("first_view")
        ).alias("us")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        (
            F.sum("us").cast("double") / F.count(F.lit(1)) / 1000000.0
        ).alias("mean_latency_s"),
        (F.percentile("us", F.array(F.lit(0.5), F.lit(0.9)))[0] / 1000000.0
         ).alias("p50_latency_s"),
        (F.percentile("us", F.array(F.lit(0.5), F.lit(0.9)))[1] / 1000000.0
         ).alias("p90_latency_s"),
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (trend + DOW seasonal + residual)
# ---------------------------------------------------------------------------


@query(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             isodow(CAST(o_orderdate AS DATE)) - 1 AS dow,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s
      FROM orders GROUP BY 1, 2
    ),
    tr AS (
      SELECT day, dow, s,
             CAST(SUM(s) OVER (ORDER BY day
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                  AS DECIMAL(18,2)) AS fsum,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS fcnt
      FROM daily
    ),
    inner_ AS (SELECT * FROM tr WHERE fcnt = 7),
    seas AS (
      SELECT dow,
             CAST(SUM(CAST(s AS DECIMAL(18,2)) * 7 - fsum) AS DOUBLE)
               / (7.0 * COUNT(*)) AS seasonal_raw,
             COUNT(*) AS n_dow
      FROM inner_ GROUP BY dow
    )
    SELECT CAST(i.day AS TIMESTAMP) AS day,
           CAST(i.s AS DOUBLE) / 1000000.0 AS y_m,
           CAST(i.fsum AS DOUBLE) / 7.0 / 1000000.0 AS trend_m,
           seasonal_raw / 1000000.0 AS seasonal_m,
           CAST(i.s AS DOUBLE) / 1000000.0
             - CAST(i.fsum AS DOUBLE) / 7.0 / 1000000.0
             - seasonal_raw / 1000000.0 AS resid_m
    FROM inner_ i JOIN seas USING (dow)
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue:
    ``y = trend + seasonal + residual`` with trend = centered 7-day
    moving average and seasonal = per-day-of-week mean detrended value —
    the moving-average decomposition (the first stage of STL), joining
    EWMA/Brown/ACF/CUSUM to complete the time-series toolkit.  Edge days
    (incomplete 7-day frames) are excluded so every trend is a full-week
    average.

    Determinism: frame sums run in exact DECIMAL (windowed double sums
    use engine-specific addition trees — segment trees vs sliding
    accumulation — and would drift); the detrended seasonal numerator is
    the exact decimal ``7·y − Σframe``; every surfaced value (in revenue
    millions) is a chain of identical single IEEE ops, emitted UNROUNDED.

    Scale: day-grain aggregation (one shuffle), one ordered window over
    the bounded daily summary, a 7-row seasonal aggregate joined back."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.weekday(F.col("o_orderdate").cast("date")).alias("dow"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("s"))
    wf = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "dow",
        "s",
        F.sum("s").over(wf).cast("decimal(18,2)").alias("fsum"),
        F.count(F.lit(1)).over(wf).alias("fcnt"),
    ).filter(F.col("fcnt") == 7)
    seas = tr.groupBy("dow").agg(
        (
            F.sum(F.col("s").cast("decimal(18,2)") * 7 - F.col("fsum"))
            .cast("double")
            / (7.0 * F.count(F.lit(1)))
        ).alias("seasonal_raw"),
    )
    y_m = F.col("s").cast("double") / 1000000.0
    trend_m = F.col("fsum").cast("double") / 7.0 / 1000000.0
    seas_m = F.col("seasonal_raw") / 1000000.0
    return tr.join(seas, "dow").select(
        F.col("day").cast("timestamp").alias("day"),
        y_m.alias("y_m"),
        trend_m.alias("trend_m"),
        seas_m.alias("seasonal_m"),
        (y_m - trend_m - seas_m).alias("resid_m"),
    )
