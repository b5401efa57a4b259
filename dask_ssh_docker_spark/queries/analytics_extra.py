"""Second-wave analytics queries (SURVEY.md §2.H/§2.I depth): bounded
EWMA smoothing, corpus bigram language-model scoring, weekly retention
cohorts, and token-length histograms.

Every computation is a JVM expression; the oracles replicate the exact
fold/rounding order so doubles survive the 6-decimal value hash.

Scale notes (100 TB):

- ``window_ewma_bounded``: one hash shuffle on user_id (the same window
  exchange as lag/rolling); the 20-row frame keeps per-row state O(1).
- ``text_bigram_logprob``: bigram counts shuffle on (w1, w2); the
  conditional denominator re-aggregates on w1.  The probability table is
  term-cardinality (unbounded on web text) — deliberately NOT
  broadcast-hinted; AQE may broadcast at small scale and shuffle-join
  past the threshold.
- ``retention_cohorts_weekly``: distinct + min + join all shuffle on
  user_id (co-partitioned after the first exchange); output is
  O(weeks²) rows.
- ``tok_len_histogram``: map-side log2 bucketing, one partial-agg'd
  shuffle on (source, bucket); output O(sources × ~20 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources import load_table
from .registry import query

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

# EWMA smoothing factor α=0.1 → decay 0.9, over a 20-row trailing frame.
_DECAY = 0.9
# Bitwise-identical divisor on BOTH engines: Python's 1-0.9 is
# 0.09999999999999998 (not 0.1); interpolating repr() into the oracle SQL
# makes DuckDB parse the exact same double Spark's F.lit carries, so the
# 6-decimal rounding boundary can never diverge by 1 ulp.
_ONE_MINUS_DECAY = 1 - _DECAY
_FRAME = 20


@query(
    "window_ewma_bounded",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN {_FRAME - 1} PRECEDING AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT user_id, event_id,
           round(list_reduce(vals, (acc, x) -> acc * {_DECAY} + x)
                 / ((1 - power({_DECAY}, len(vals))) / {_ONE_MINUS_DECAY!r}), 6)
             AS ewma
    FROM v
    """,
)
def window_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user over a
    bounded {frame}-row trailing frame (the streaming-safe EWMA form: the
    pandas ``ewm(adjust=True)`` weights, truncated to the frame, so state
    is O(frame) instead of O(history)).

    Determinism: the numerator is a LEFT FOLD ``acc*decay + x`` over the
    frame-ordered value list — Spark's ``aggregate(…, 0.0, …)`` and
    DuckDB's ``list_reduce`` (seeded with the first element) perform the
    identical IEEE op sequence — and the denominator is the closed-form
    geometric series (1-d^n)/(1-d).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-(_FRAME - 1), 0)
    )
    vals = F.collect_list(F.col("value").cast("double")).over(w)
    num = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc * F.lit(_DECAY) + x
    )
    den = (F.lit(1.0) - F.pow(F.lit(_DECAY), F.size(vals))) / F.lit(
        _ONE_MINUS_DECAY
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(num / den, 6).alias("ewma"),
    )


@query(
    "window_rolling_corr",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS prev_v
      FROM events
    ),
    rc AS (
      SELECT user_id, event_id,
             corr(value, prev_v) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN {_FRAME - 1} PRECEDING AND CURRENT ROW) AS c
      FROM lagged
    )
    SELECT user_id, event_id,
           round(CASE WHEN isnan(c) THEN NULL ELSE c END, 6) AS roll_corr
    FROM rc
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson autocorrelation (pandas ``rolling(20).corr`` of a
    series with its lag-1): the mean-reversion / momentum diagnostic.
    Zero-variance frames are the hazard here: Spark 4's native ``corr``
    runs ``ck / sqrt(xMk*yMk)`` under ANSI mode and THROWS
    DIVIDE_BY_ZERO the moment any frame's x or y values are all equal —
    a 2-row early frame with one adjacent tied value suffices (measured:
    fires at sf1 where ties occur; small-sf testdata just never tied).
    So the Spark side computes Pearson explicitly as
    ``try_divide(covar_samp, stddev·stddev)`` — algebraically identical
    (both reduce to ck/√(xMk·yMk); the extra (n-1) divisions cancel and
    are absorbed by the 6-decimal rounding) and NULL, not an exception,
    on degenerate frames.  DuckDB's corr returns NULL there natively;
    both sides also normalize NaN→NULL (n=1 frames).  Same single
    user_id window exchange as the other rolling queries."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.unix_micros("ts"), F.col("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_frame = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(-(_FRAME - 1), 0)
    )
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w_lag).alias("prev_v"),
    )
    # pairwise-complete discipline: the frame's first-of-user row carries
    # prev_v=NULL and is excluded from corr's pairs, so the x-stddev must
    # exclude that row's value too (mask value where prev_v is NULL)
    x = F.when(F.col("prev_v").isNotNull(), F.col("value"))
    rc = F.try_divide(
        F.covar_samp(x, "prev_v").over(w_frame),
        F.stddev_samp(x).over(w_frame) * F.stddev_samp("prev_v").over(w_frame),
    )
    rc_null = F.when(F.isnan(rc), F.lit(None).cast("double")).otherwise(rc)
    return lagged.select(
        "user_id",
        "event_id",
        F.round(rc_null, 6).alias("roll_corr"),
    )


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
    ),
    bi AS (
      SELECT doc_id,
             unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)])   AS w2
      FROM base WHERE len(toks) >= 2
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
    c1  AS (SELECT w1, SUM(c12) AS c1 FROM cnt GROUP BY w1),
    p AS (
      SELECT w1, w2, ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) AS logp
      FROM cnt JOIN c1 USING (w1)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(SUM(logp) / COUNT(*), 6) AS avg_logprob
    FROM bi JOIN p USING (w1, w2)
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model score per document: P(w2|w1) from the
    corpus's own bigram/unigram counts, document score = mean log
    probability (the KenLM-style fluency proxy used to filter gibberish
    from web crawl — a doc of globally-rare transitions scores low).

    Per-row float sums accumulate in engine order; at document size the
    drift is ~1e-13, far under the 6-decimal hash normalization.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    staged = docs.select("doc_id", tokens("text").alias("t")).filter(F.size("t") >= 2)
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = staged.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    # lazy lineage cuts: bi feeds the LM counts AND the scoring join;
    # cnt feeds the unigram marginals AND the probability join — without
    # them the bigram explode executes twice and the count shuffle twice
    bi = bi.localCheckpoint(eager=False)
    cnt = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cnt = cnt.localCheckpoint(eager=False)
    c1 = cnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # term-cardinality tables: no forced broadcast (see module scale notes)
    p = cnt.join(c1, "w1").select(
        "w1",
        "w2",
        F.log(F.col("c12").cast("double") / F.col("c1").cast("double")).alias("logp"),
    )
    return (
        bi.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("logp") / F.count("*"), 6).alias("avg_logprob"),
        )
    )


@query(
    "text_dup_sentence_fraction",
    oracle=f"""
    WITH s0 AS (
      SELECT doc_id,
             unnest(list_distinct(regexp_split_to_array({_NORM}, '\\.\\s+')))
               AS sent
      FROM documents WHERE text IS NOT NULL
    ),
    s AS (SELECT doc_id, sent FROM s0 WHERE length(sent) >= 20),
    cnt AS (SELECT sent, COUNT(*) AS n_docs FROM s GROUP BY sent)
    SELECT doc_id, COUNT(*) AS n_sents,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_frac
    FROM s JOIN cnt USING (sent)
    GROUP BY doc_id
    """,
)
def text_dup_sentence_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-duplication audit: fraction of a document's distinct
    sentences (≥20 chars) that appear in at least one other document —
    the signal behind removing boilerplate/templated spans from web
    crawl.  Distinct (doc, sentence) rows shuffle once on sentence for
    the corpus counts and join back un-hinted (sentence cardinality grows
    with the corpus)."""
    from ..functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    s = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(normalize_text("text"), r"\.\s+"))
            ).alias("sent"),
        )
        .filter(F.length("sent") >= 20)
    )
    # lazy lineage cut: s feeds the corpus sentence counts AND the
    # join back — one cut, one sentence-explode execution
    s = s.localCheckpoint(eager=False)
    cnt = s.groupBy("sent").agg(F.count("*").alias("n_docs"))
    return (
        s.join(cnt, "sent")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sents"),
            (
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("dup_frac"),
        )
    )


@query(
    "anomaly_zscore_ewma",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN {_FRAME} PRECEDING AND 1 PRECEDING) AS prev_vals,
             stddev_samp(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN {_FRAME} PRECEDING AND 1 PRECEDING) AS prev_std
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN len(prev_vals) >= 2 AND prev_std > 0 THEN
             round((value
                    - list_reduce(prev_vals, (acc, x) -> acc * {_DECAY} + x)
                      / ((1 - power({_DECAY}, len(prev_vals))) / {_ONE_MINUS_DECAY!r}))
                   / prev_std, 6)
           END AS zscore
    FROM base
    """,
)
def anomaly_zscore_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-residual anomaly score: each event's deviation from the EWMA
    of its PRECEDING frame, scaled by the preceding frame's stddev — the
    monitoring-pipeline outlier signal (emitted as a continuous score;
    thresholding is the caller's policy, keeping the oracle free of
    boundary-sensitive booleans).  Same single user_id window exchange;
    the fold arithmetic is the proven EWMA left fold."""
    ev = load_table(spark, sf_dir, "events")
    order = [F.unix_micros("ts"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(-_FRAME, -1)
    )
    prev_vals = F.collect_list(F.col("value").cast("double")).over(w_prev)
    prev_std = F.stddev_samp(F.col("value")).over(w_prev)
    n = F.size(prev_vals)
    ewma_prev = F.aggregate(
        prev_vals, F.lit(0.0), lambda acc, x: acc * F.lit(_DECAY) + x
    ) / ((F.lit(1.0) - F.pow(F.lit(_DECAY), n)) / F.lit(_ONE_MINUS_DECAY))
    score = F.when(
        (n >= 2) & (prev_std > 0),
        F.round((F.col("value") - ewma_prev) / prev_std, 6),
    )
    return ev.select("user_id", "event_id", score.alias("zscore"))


@query(
    "retention_cohorts_weekly",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    f AS (SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id)
    SELECT cohort,
           CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM uw JOIN f USING (user_id)
    GROUP BY cohort, week_offset
    """,
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    ISO week, counted in each subsequent active week.  Week offsets are
    exact multiples of 7 days, so the day-diff/7 arithmetic is integral
    in both engines (no rounding-mode exposure)."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        uw.join(first, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


@query(
    "qcut_order_price_quartiles",
    oracle="""
    WITH q AS (
      SELECT
        percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS q1,
        percentile_cont(0.50) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS q2,
        percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS q3
      FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CAST(CASE WHEN o_totalprice <= q1 THEN 0
                     WHEN o_totalprice <= q2 THEN 1
                     WHEN o_totalprice <= q3 THEN 2
                     ELSE 3 END AS BIGINT) AS bucket
    FROM orders CROSS JOIN q
    """,
)
def qcut_order_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``qcut(x, 4)`` equivalent: per-row quartile labels from the
    EXACT global quantile boundaries (percentile_cont linear interpolation
    — identical doubles in both engines, so the <= comparisons match
    bitwise).

    Scale: the boundary frame is a 1-row GLOBAL aggregate — bounded
    forever, broadcast back (exempt from the unbounded-aggregate hint
    ban); the labeling pass is pure map-side.  Exact global quantiles
    sort-aggregate the full column; ``approx_percentile`` is the
    documented 100 TB substitution (see approx_distinct_quantiles)."""
    o = load_table(spark, sf_dir, "orders")
    # ONE array-percentile aggregate: scalar percentile() calls each
    # build their own sorted value buffer (group_quantiles_exact note)
    q = o.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("__q")
    ).select(
        F.col("__q")[0].alias("q1"),
        F.col("__q")[1].alias("q2"),
        F.col("__q")[2].alias("q3"),
    )
    v = F.col("o_totalprice")
    return (
        o.select("o_orderkey", "o_totalprice")
        .crossJoin(F.broadcast(q))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(v <= F.col("q1"), 0)
            .when(v <= F.col("q2"), 1)
            .when(v <= F.col("q3"), 2)
            .otherwise(3)
            .cast("bigint")
            .alias("bucket"),
        )
    )


@query(
    "resample_hourly_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
      FROM events GROUP BY event_type, hr
    ),
    bounds AS (
      SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
      FROM hourly GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    )
    SELECT s.event_type, s.hr,
           COALESCE(h.cnt, 0) AS n_events,
           CASE WHEN h.cnt IS NULL THEN 1 ELSE 0 END AS gap_filled
    FROM spine s LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hr = h.hr
    """,
)
def resample_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample: a dense per-type hour spine
    (``sequence`` between each type's first and last active hour) left-
    joined to the sparse hourly counts, empty buckets emitted as zero
    with a fill flag — the timescale-style ``time_bucket_gapfill``
    behavior that plain ``resample_hourly`` (present-buckets-only) lacks.

    Scale: one (type, hour) shuffle for the counts; the spine is
    O(types × calendar hours) — bounded by wall-clock time, not data —
    and the final join is AQE-broadcastable."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("cnt"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    return (
        spine.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
            F.when(F.col("cnt").isNull(), 1).otherwise(0).alias("gap_filled"),
        )
    )


@query(
    "resample_hourly_ohlc",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hr,
           arg_min(value, ts) AS open,
           MAX(value)         AS high,
           MIN(value)         AS low,
           arg_max(value, ts) AS close,
           COUNT(*)           AS n_events
    FROM events
    GROUP BY event_type, hr
    """,
)
def resample_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (pandas ``resample('1h').ohlc()``): per type and
    hour, the first/last value by event time plus the extremes — the
    financial-bar / metrics-rollup shape.  ``min_by``/``max_by`` keep it
    one partial-agg'd shuffle; deterministic because ``ts`` is unique in
    the testdata (and at 100 TB the tie-break is a composite order
    column)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr"), "ts", "value"
        )
        .groupBy("event_type", "hr")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "tok_len_histogram",
    oracle=f"""
    WITH t AS (
      SELECT source, len({_TOKS}) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(floor(log2(n_tokens + 1)) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM t GROUP BY source, bucket
    """,
)
def tok_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram per source — the
    length-distribution audit run before choosing context window / pack
    sizes.  Map-side bucketing, one partial-agg'd shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select("source", F.size(tokens("text")).alias("n_tokens"))
    return (
        t.groupBy(
            "source",
            F.floor(F.log2(F.col("n_tokens") + 1)).cast("bigint").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# Robust z-score: 3.5 · 1.4826 pre-multiplied into ONE literal so both
# engines parse the identical double (Spark's 3.5*1.4826 double product
# and DuckDB's DECIMAL 5.18910 → DOUBLE cast could differ in the last
# bit; a shared literal can't).
_MAD_K = "5.1891"


@query(
    "robust_outliers_mad",
    oracle=f"""
    WITH med AS (
      SELECT user_id, median(CAST(value AS DOUBLE)) AS med
      FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id,
             median(abs(CAST(e.value AS DOUBLE) - m.med)) AS mad
      FROM events e JOIN med m USING (user_id) GROUP BY e.user_id
    )
    SELECT e.user_id,
           round(m.med, 6) AS med,
           round(d.mad, 6) AS mad,
           COUNT(*) AS n,
           COUNT(*) FILTER (
             WHERE abs(CAST(e.value AS DOUBLE) - m.med)
                   > CAST({_MAD_K} AS DOUBLE) * d.mad
           ) AS n_outliers
    FROM events e
    JOIN med m USING (user_id)
    JOIN mad d USING (user_id)
    GROUP BY e.user_id, m.med, d.mad
    """,
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier audit per user (the heavy-tail-safe
    alternative to mean/stddev z-scores): flag |x − med| > 3.5 · 1.4826
    · MAD.  The threshold multiplies instead of dividing, so zero-MAD
    groups need no NaN handling.

    Scale shape: two exact-median grouped aggregations + two
    co-partitioned joins — every exchange keyed on user_id, so after the
    first shuffle the rest are co-located.  At 100 TB you'd swap
    ``median`` for ``approx_percentile`` (sketch-mergeable, map-side
    partials) — the driver-checked exact form pins the semantics."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("double")
    )
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    mad = (
        ev.join(med, "user_id")
        .groupBy("user_id")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    thresh = F.lit(float(_MAD_K)) * F.col("mad")
    return (
        ev.join(med, "user_id")
        .join(mad, "user_id")
        .groupBy("user_id", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > thresh, 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select(
            "user_id",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            "n_outliers",
        )
    )


@query(
    "winsorize_bounds_audit",
    oracle="""
    WITH b AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS p05,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY CAST(value AS DOUBLE)) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(b.p05, 6) AS p05,
           round(b.p95, 6) AS p95,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE CAST(e.value AS DOUBLE) < b.p05) AS n_clip_low,
           COUNT(*) FILTER (WHERE CAST(e.value AS DOUBLE) > b.p95) AS n_clip_high
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    """,
)
def winsorize_bounds_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit per event type: exact p05/p95 clip bounds and
    how many rows each tail would clip — the pre-flight check before
    capping a reward/score column in a training pipeline.

    Scale shape: one exact-percentile aggregation per group + one
    co-partitioned join back; both exchanges keyed on event_type.  The
    clip itself (``least(greatest(value, p05), p95)``) is a free map-side
    expression once the bounds are joined in."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("double")
    )
    # one array-percentile aggregate (group_quantiles_exact note)
    b = ev.groupBy("event_type").agg(
        F.percentile(
            "value", F.array(F.lit(0.05), F.lit(0.95))
        ).alias("__p")
    ).select(
        "event_type",
        F.col("__p")[0].alias("p05"),
        F.col("__p")[1].alias("p95"),
    )
    return (
        ev.join(b, "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clip_low"
            ),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clip_high"
            ),
        )
        .select(
            "event_type",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "n",
            "n_clip_low",
            "n_clip_high",
        )
    )


@query(
    "entropy_event_mix",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             SUM(COUNT(*)) OVER (PARTITION BY user_id) AS tot
      FROM events GROUP BY user_id, event_type
    ),
    t AS (
      SELECT user_id, tot,
             -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) AS term,
             event_type
      FROM c
    )
    SELECT user_id,
           CAST(any_value(tot) AS BIGINT) AS n_events,
           COUNT(*) AS n_types,
           round(list_reduce(list(term ORDER BY event_type),
                             (a, b) -> a + b) + 0.0, 6) AS entropy_nats
    FROM t GROUP BY user_id
    """,
)
def entropy_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix (nats) — the
    diversity audit run on a training-data source distribution before
    fixing mixing weights (low entropy = one source dominates).

    Determinism: the per-type terms fold in a FIXED order (sorted by
    event_type) in both engines — the same left-fold discipline as the
    EWMA queries — so the double sum is bit-identical; ``+ 0.0``
    normalizes the −0.0 a single-type group would produce.

    Scale shape: one (user, type) partial-agg'd shuffle, then one user
    shuffle carrying ≤ |types| rows per user; the fold is a map-side
    higher-order function over a bounded array."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    wsum = Window.partitionBy("user_id")
    t = c.withColumn("tot", F.sum("n").over(wsum)).withColumn(
        "p", F.col("n").cast("double") / F.col("tot").cast("double")
    )
    per_user = t.groupBy("user_id").agg(
        F.max("tot").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.array_sort(
            F.collect_list(F.struct("event_type", (-F.col("p") * F.log("p")).alias("term")))
        ).alias("arr"),
    )
    ent = F.aggregate(
        F.transform("arr", lambda x: x["term"]), F.lit(0.0), lambda a, b: a + b
    )
    return per_user.select(
        "user_id",
        "n_events",
        "n_types",
        F.round(ent + F.lit(0.0), 6).alias("entropy_nats"),
    )


@query(
    "ab_test_welch",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n1,
             COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n0,
             SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE user_id % 2 = 1) AS s1,
             SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE user_id % 2 = 0) AS s0,
             SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
               FILTER (WHERE user_id % 2 = 1) AS q1,
             SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
               FILTER (WHERE user_id % 2 = 0) AS q0
      FROM events GROUP BY event_type
    )
    SELECT event_type, n1, n0,
           round(CAST(s1 AS DOUBLE) / n1, 6) AS mean_treat,
           round(CAST(s0 AS DOUBLE) / n0, 6) AS mean_ctrl,
           round(
             (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / sqrt(
                 ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1)) / n1
                 + ((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0) / (n0 - 1)) / n0
               ), 6) AS t_welch
    FROM s
    """,
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-statistic per event type (arms = user_id
    parity — the deterministic stand-in for an experiment assignment):
    the A/B readout an experimentation pipeline computes over billions of
    exposures.

    Determinism: first and second moments accumulate in EXACT decimal
    (sum, sum-of-squares), so every double that enters the t formula is
    bit-identical in both engines, and the remaining arithmetic is the
    same IEEE expression tree — no variance-accumulation-order drift
    (Spark's ``var_samp`` partials would differ in the last bits).

    Scale shape: one partial-agg'd shuffle on event_type; everything else
    is a map-side expression over the 1-row-per-group moments — the same
    plan at 100 TB, and the moments are algebraically mergeable, so this
    drops into the incremental-MV merge (``streaming/mv.py``) unchanged."""
    ev = load_table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(12,2)")
    treat = F.col("user_id") % 2 == 1
    s = ev.groupBy("event_type").agg(
        F.count(F.when(treat, 1)).alias("n1"),
        F.count(F.when(~treat, 1)).alias("n0"),
        F.sum(F.when(treat, d)).alias("s1"),
        F.sum(F.when(~treat, d)).alias("s0"),
        F.sum(F.when(treat, d * d)).alias("q1"),
        F.sum(F.when(~treat, d * d)).alias("q0"),
    )
    s1d, s0d = F.col("s1").cast("double"), F.col("s0").cast("double")
    q1d, q0d = F.col("q1").cast("double"), F.col("q0").cast("double")
    n1, n0 = F.col("n1"), F.col("n0")
    m1, m0 = s1d / n1, s0d / n0
    v1 = (q1d - s1d * s1d / n1) / (n1 - 1)
    v0 = (q0d - s0d * s0d / n0) / (n0 - 1)
    return s.select(
        "event_type",
        "n1",
        "n0",
        F.round(m1, 6).alias("mean_treat"),
        F.round(m0, 6).alias("mean_ctrl"),
        F.round((m1 - m0) / F.sqrt(v1 / n1 + v0 / n0), 6).alias("t_welch"),
    )
