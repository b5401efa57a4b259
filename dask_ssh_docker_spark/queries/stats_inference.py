"""Statistical-inference analytics (SURVEY.md §2.H extension): the
model-diagnostic readouts a training-data / experimentation pipeline runs
over curated tables — grouped OLS regression, a chi-square independence
audit, revenue-concentration (Gini), and series autocorrelation.

Determinism doctrine (see ``_util.py``): every cross-row accumulation runs
in exact DECIMAL (order-independent in both engines); the closed-form
double arithmetic that follows is the *identical* IEEE op tree on
identical inputs, so Spark and DuckDB emit bit-identical doubles with no
reliance on rounding luck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from ._util import dec
from .registry import query


@query(
    "regression_price_on_qty",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))
                      * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n AS n_rows,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
           (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
             / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * sxy - sx * sy)
              * (CAST(n AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n AS DOUBLE) * syy - sy * sy)) AS r2
    FROM m
    """,
)
def regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple OLS (extendedprice ~ quantity) from mergeable
    exact-decimal moments — the closed form
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``, the distributed
    regression recipe: one partial/final hash aggregation collects the
    five moments (all exact DECIMAL — quantity is integral so Σx/Σx² are
    exact integers, price is cents-exact), then the slope/intercept/r²
    doubles come from the same IEEE op tree in both engines.  Unlike the
    built-in ``regr_slope`` (double covariance accumulation whose result
    depends on partition order), this is bit-reproducible on any cluster
    layout.

    Scale: identical shape to q1 — map-side partial aggregation over
    5 moments × |groups| rows, one tiny shuffle; no second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(4,0)")
    p = dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    snum = n * F.col("sxy") - F.col("sx") * F.col("sy")
    sden = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = snum / sden
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
        ((snum * snum) / (sden * (n * F.col("syy") - F.col("sy") * F.col("sy"))))
        .alias("r2"),
    )


@query(
    "chisq_flag_status",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS observed
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_returnflag, l_linestatus, observed,
             SUM(observed) OVER (PARTITION BY l_returnflag) AS row_tot,
             SUM(observed) OVER (PARTITION BY l_linestatus) AS col_tot,
             SUM(observed) OVER () AS grand
      FROM cells
    )
    SELECT l_returnflag, l_linestatus, observed,
           round(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                   / CAST(grand AS DOUBLE), 6) AS expected,
           round((CAST(observed AS DOUBLE)
                    - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                        / CAST(grand AS DOUBLE))
                 * (CAST(observed AS DOUBLE)
                    - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                        / CAST(grand AS DOUBLE))
                 / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                        / CAST(grand AS DOUBLE)), 6) AS chisq_contrib
    FROM tot
    """,
)
def chisq_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the returnflag × linestatus
    contingency table — the standard drift / association check a feature
    pipeline runs between two categorical columns.  Emits one row per
    cell with observed count, expected count under independence, and the
    cell's χ² contribution (the caller sums a handful of cells; keeping
    the output per-cell avoids a cross-row double sum whose accumulation
    order differs between engines).  Counts are exact integers; the
    expected/contrib doubles come from the identical op tree both sides.

    Scale: one hash aggregation to |flag|×|status| cells (≤ dozens), then
    window sums over that tiny grouped frame — marginals never touch the
    fact table again."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("observed")
    )
    tot = cells.select(
        "l_returnflag",
        "l_linestatus",
        "observed",
        F.sum("observed").over(Window.partitionBy("l_returnflag")).alias("row_tot"),
        F.sum("observed").over(Window.partitionBy("l_linestatus")).alias("col_tot"),
        F.sum("observed").over(Window.partitionBy()).alias("grand"),
    )
    exp = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("grand").cast("double")
    )
    diff = F.col("observed").cast("double") - exp
    return tot.select(
        "l_returnflag",
        "l_linestatus",
        "observed",
        F.round(exp, 6).alias("expected"),
        F.round(diff * diff / exp, 6).alias("chisq_contrib"),
    )


@query(
    "gini_revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS r
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, CAST(r AS DECIMAL(14,2)) AS r,
             ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i
      FROM rev
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS total_revenue,
           round((2.0 * CAST(SUM(i * r) AS DOUBLE)
                    - (CAST(COUNT(*) AS DOUBLE) + 1.0) * CAST(SUM(r) AS DOUBLE))
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)), 6)
             AS gini
    FROM ranked
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration /
    inequality readout (is 1 % of customers 90 % of revenue?), computed
    by the rank formula ``G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)`` over
    revenue sorted ascending.  Per-customer revenue and the rank-weighted
    sum are exact DECIMAL (rank ties broken on custkey over exact values,
    so both engines rank identically); the final G is one identical
    double expression.

    Scale: aggregate to |customers| rows, then the ranks come from the
    DISTRIBUTED rank decomposition (``operators/ranking.py``): quantile-
    sketch bucket edges → map-side bucketing → per-bucket window + tiny
    broadcast offsets — exact ranks, no single-partition sort (the r4
    scale-killer; plan-asserted window-free in tests/test_plans.py)."""
    from ..operators.ranking import with_global_row_number

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("decimal(14,2)").alias("r")
    ).localCheckpoint(eager=False)  # grain cut: the eager sketch would re-run the agg
    ranked = with_global_row_number(
        rev, [("r", True), ("o_custkey", True)], out="i"
    )
    n = F.count(F.lit(1)).cast("double")
    sr = F.sum("r").cast("double")
    sir = F.sum(F.col("i") * F.col("r")).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("r").cast("double").alias("total_revenue"),
        F.round((F.lit(2.0) * sir - (n + F.lit(1.0)) * sr) / (n * sr), 6)
        .alias("gini"),
    )


@query(
    "acf_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                  AS DECIMAL(14,2)) AS rev
      FROM lineitem GROUP BY 1
    ),
    series AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily
    ),
    ks AS (SELECT unnest(range(1, 8)) AS k),
    pairs AS (
      SELECT ks.k, a.rev AS x, b.rev AS y
      FROM series a
      CROSS JOIN ks
      JOIN series b ON b.rn = a.rn - ks.k
    ),
    m AS (
      -- widen one multiplicand to DECIMAL(24,2): DuckDB would otherwise
      -- attempt the (14,2)x(14,2) product in int64 and overflow at sf1
      -- daily-revenue magnitudes (~1e7); (24,2)x(14,2) -> (38,4) runs in
      -- int128 and stays exact (Spark widens to (29,4) natively)
      SELECT k, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(24,2)) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(24,2)) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(24,2)) * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INT) AS lag_k, n AS n_pairs,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS acf
    FROM m
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily-revenue series at lags 1–7
    (trading-day convention: lag = k *rows* of the date-ordered series,
    so calendar gaps don't create artificial misses) — the seasonality
    probe run before fitting any forecast model.  Daily revenue is an
    exact-decimal aggregate; each lag's Pearson r comes from exact
    decimal moment sums and one identical double expression (sqrt is
    IEEE correctly-rounded in both engines).

    Scale: the fact scan collapses to |days| rows first; the 7 lags are
    seven window-lag columns over ONE date-ordered window (single
    exchange of the tiny daily series), unpivoted with ``stack`` —
    not seven self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.to_date(F.date_trunc("day", "l_shipdate")).alias("d"))
        .agg(F.sum(dec("l_extendedprice")).cast("decimal(14,2)").alias("rev"))
    )
    w = Window.orderBy("d")
    lag_cols = [
        F.lag("rev", k).over(w).alias(f"lag{k}") for k in range(1, 8)
    ]
    lagged = daily.select("rev", *lag_cols)
    stack_expr = "stack(7, " + ", ".join(
        f"{k}, lag{k}" for k in range(1, 8)
    ) + ") AS (lag_k, prev)"
    pairs = lagged.select("rev", F.expr(stack_expr)).filter(
        F.col("prev").isNotNull()
    )
    m = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").cast("double").alias("sx"),
        F.sum("prev").cast("double").alias("sy"),
        F.sum(F.col("rev") * F.col("prev")).cast("double").alias("sxy"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("sxx"),
        F.sum(F.col("prev") * F.col("prev")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    return m.select(
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("n").alias("n_pairs"),
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("acf"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gset,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE sugar over):
    cell, both marginals, and grand total in ONE aggregation pass, with a
    ``GROUPING()``-derived set id disambiguating real NULL group values
    from subtotal placeholders — the complete multi-granularity rollup
    surface alongside agg_rollup / agg_cube.

    Scale: Catalyst expands the sets into one Expand + single hash
    aggregation (the fact table is read once, not once per set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        (F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus"))
        .alias("gset"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
    )
