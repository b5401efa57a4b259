"""Wave-8 analytics: Pareto-front (skyline) extraction, weekly funnel
conversion trend, and audience-overlap (set-similarity of user segments).

Determinism doctrine as elsewhere: integer distinct counts, exact-decimal
measures, mirrored single-division ratios; every windowed pass runs over
a bounded pre-aggregated summary, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query(
    "pareto_front_orders",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS day_max
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    front_days AS (
      SELECT day, day_max FROM (
        SELECT day, day_max,
               MAX(day_max) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND 1 PRECEDING) AS pm
        FROM d
      ) WHERE pm IS NULL OR day_max > pm
    )
    SELECT o.o_orderkey,
           CAST(f.day AS TIMESTAMP) AS day,
           CAST(f.day_max AS DOUBLE) AS price
    FROM front_days f
    JOIN orders o
      ON CAST(o.o_orderdate AS DATE) = f.day
     AND CAST(o.o_totalprice AS DECIMAL(12,2)) = f.day_max
    """,
)
def pareto_front_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front (skyline) of orders on (earlier date, higher price):
    an order is on the front iff no strictly-earlier day carries an
    equal-or-higher price — the classic two-criteria skyline, computed
    scalably as day-grain max first (bounded summary), a running-max scan
    over days, then a join back to recover every order attaining its
    day's front price.

    Note the day-grain reduction also resolves the same-day semantics:
    same-day orders don't dominate each other, so all orders tying the
    day max qualify — deterministic without tie-breaks.

    Determinism: prices compare as exact DECIMAL; the front membership
    test is an exact comparison; output price surfaces as double (2-dec
    cents-exact, safe).

    Scale: one day-grain shuffle (≤ calendar days rows), an ordered scan
    over that summary, one equi-join back on (day, price) — raw orders
    never enter a global window."""
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(12,2)")
    d = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.max(p).alias("day_max")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        d.withColumn("pm", F.max("day_max").over(w))
        .filter(F.col("pm").isNull() | (F.col("day_max") > F.col("pm")))
        .select("day", "day_max")
    )
    return front.join(
        orders,
        (orders.o_orderdate.cast("date") == front.day)
        & (p == front.day_max),
    ).select(
        "o_orderkey",
        F.col("day").cast("timestamp").alias("day"),
        F.col("day_max").cast("double").alias("price"),
    )


@query(
    "funnel_weekly_trend",
    oracle="""
    WITH w AS (
      SELECT date_trunc('week', ts) AS week, event_type, user_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    g AS (
      SELECT week,
             COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'view')
               AS n_viewers,
             COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
               AS n_buyers
      FROM w GROUP BY week
    )
    SELECT CAST(week AS TIMESTAMP) AS week, n_viewers, n_buyers,
           round(CAST(n_buyers AS DOUBLE) / CAST(n_viewers AS DOUBLE), 6)
             AS conversion_rate
    FROM g
    """,
)
def funnel_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly funnel conversion trend: distinct viewers vs distinct
    buyers per Monday-start week, with their ratio — the time-resolved
    companion of ``funnel_view_click_purchase`` (which measures ordered
    stage progression over the whole corpus).

    Determinism: integer distinct counts; one mirrored division; rate ≤ 1
    so round-6 is safe.

    Scale: one (week, type, user) distinct-ish aggregation — Catalyst
    expands the two COUNT(DISTINCT) into a single partial-agg'd expand —
    onto calendar-bounded output rows."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        F.date_trunc("week", "ts").alias("week"), "event_type", "user_id"
    )
    g = w.groupBy("week").agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_viewers"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_buyers"),
    )
    return g.select(
        F.col("week").cast("timestamp").alias("week"),
        "n_viewers",
        "n_buyers",
        F.round(
            F.col("n_buyers").cast("double")
            / F.col("n_viewers").cast("double"),
            6,
        ).alias("conversion_rate"),
    )


@query(
    "audience_overlap_pairs",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, COUNT(*) AS n FROM s GROUP BY event_type
    ),
    ov AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_overlap
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, n_overlap,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_overlap AS DOUBLE)
                 / CAST(sa.n + sb.n - n_overlap AS DOUBLE), 6) AS jaccard
    FROM ov
    JOIN sizes sa ON sa.event_type = ov.type_a
    JOIN sizes sb ON sb.event_type = ov.type_b
    """,
)
def audience_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event-type user segments:
    exact intersection size and Jaccard similarity for every unordered
    type pair — the audience-dedup / campaign-planning readout (the HLL
    sibling would sketch each segment and estimate the union; this is the
    exact form, sized |types|²).

    Determinism: integer set sizes; one mirrored division; Jaccard ≤ 1 so
    round-6 is safe.

    Scale: the distinct (type, user) frame shuffles once on user for the
    self-join; output is |types|² rows.  At extreme segment counts swap
    the pairwise self-join for per-segment HLL/bitmap sketches
    (``rollup_cascade_daily_hll`` / ``bitmap_distinct_users`` machinery)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("event_type", "user_id").distinct()
    sizes = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(F.col("event_type").alias("type_a"), "user_id")
    b = s.select(F.col("event_type").alias("type_b"), "user_id")
    ov = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    out = (
        ov.join(
            sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")),
            "type_a",
        )
        .join(
            sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")),
            "type_b",
        )
    )
    return out.select(
        "type_a",
        "type_b",
        "n_overlap",
        "n_a",
        "n_b",
        F.round(
            F.col("n_overlap").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
    )


_RFM_ANCHOR = "2001-08-02"


@query(
    "rfm_customer_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey AS custkey,
             datediff('day', CAST(MAX(o_orderdate) AS DATE),
                      DATE '{_RFM_ANCHOR}') AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, recency_days, frequency, monetary,
             NTILE(5) OVER (ORDER BY recency_days DESC, custkey) AS r_q,
             NTILE(5) OVER (ORDER BY frequency, custkey) AS f_q,
             NTILE(5) OVER (ORDER BY monetary, custkey) AS m_q
      FROM base
    )
    SELECT custkey, recency_days, frequency, monetary,
           r_q * 100 + f_q * 10 + m_q AS rfm_score
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, Recency (days from last order to
    the corpus anchor), Frequency (order count), Monetary (exact-decimal
    spend), each quintiled with NTILE(5) — higher quintile = better
    (most recent / most frequent / highest spend) — composed into the
    classic 3-digit RFM score.

    Determinism: NTILE is purely positional; every ordering carries the
    custkey tie-break, so bucket boundaries are exact in both engines.
    Monetary converts from an exact decimal (< 2^53 scaled units).

    Scale: one customer-grain aggregation, then three EXACT NTILEs from
    the distributed rank decomposition (``operators/ranking.py``:
    sketch-bucketed rank + broadcast offsets — bit-equal to the
    single-partition NTILE window it replaces, pinned in
    tests/test_ranking.py) — no unpartitioned window anywhere in the
    plan (the r4 scale-killer; plan-asserted in tests/test_plans.py)."""
    from ..operators.ranking import with_global_ntiles

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("monetary"),
    ).localCheckpoint(eager=False)
    # lazy cut on the customer grain: each NTILE's eager quantile sketch
    # (and its total-count broadcast) would otherwise re-execute the
    # orders aggregation — the first sketch materializes the grain into
    # cache and the other five scans read it
    # fused: ONE eager aggregate sketches all three order keys and the
    # row count together; three sketch scans of the grain become one
    scored = with_global_ntiles(
        base,
        [
            ([("recency_days", False), ("custkey", True)], "r_q"),
            ([("frequency", True), ("custkey", True)], "f_q"),
            ([("monetary", True), ("custkey", True)], "m_q"),
        ],
        5,
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        (
            F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")
        ).alias("rfm_score"),
    )


@query(
    "abc_part_classification",
    oracle="""
    WITH p AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT partkey, rev,
             CAST(SUM(rev) OVER (ORDER BY rev DESC, partkey)
                  AS DECIMAL(18,2)) AS cum,
             CAST(SUM(rev) OVER () AS DECIMAL(18,2)) AS tot
      FROM p
    )
    SELECT partkey,
           CAST(rev AS DOUBLE) AS revenue,
           CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                WHEN cum * 100 <= tot * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue;
    the head covering ≤80% of cumulative revenue is class A, ≤95% B,
    the tail C — the standard 80/15/5 stock-priority split.

    Determinism: the class test is the exact integer-decimal comparison
    ``cum·100 ≤ tot·k`` — no float share ever computed, so boundary
    parts classify identically in both engines (a double share at the
    80.000…% edge would be a coin flip).

    Scale: one part-grain aggregation, then the cumulative revenue comes
    from the distributed running-sum decomposition
    (``operators/ranking.py`` — exact decimal arithmetic end to end,
    per-bucket window + broadcast lower-bucket offsets) and the total
    from a 1-row broadcast aggregate — no unpartitioned window in the
    plan (the r4 scale-killer; plan-asserted in tests/test_plans.py);
    the revenue output is a safe cents-exact double."""
    from ..operators.ranking import with_global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("rev")
    ).localCheckpoint(eager=False)  # grain cut: sketch + total + window share one agg
    tot = p.agg(F.sum("rev").cast("decimal(18,2)").alias("tot"))
    c = (
        with_global_running_sum(
            p, [("rev", False), ("partkey", True)], "rev", out="__cum"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "partkey",
            "rev",
            F.col("__cum").cast("decimal(18,2)").alias("cum"),
            "tot",
        )
    )
    return c.select(
        "partkey",
        F.col("rev").cast("double").alias("revenue"),
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
