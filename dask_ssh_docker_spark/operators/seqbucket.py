"""Time-range sub-bucketing for sequence-semantics windows (r12, VERDICT
r11 item 2 — SCALE.md class 7).

A per-key ordered window is inherently ONE partition per key: AQE cannot
split window partitions, so a bot key holding 10⁸ events routes its
entire row volume through one task's sort — the one window class the r11
census left unmeasured.  Three mitigations now exist, each output-
identical to the global-window shape where its preconditions hold:

- ``operators/asof.py`` ``merge_asof(bucket_width=…)`` — EXACT for any
  width: cross-bucket fill context is a per-bucket ``max_by``/``min_by``
  payload aggregate cascaded over the bounded per-key bucket spine.
- ``operators/interpolate.py`` ``interpolate_linear(bucket_width_s=…)``
  — EXACT for any width, same carry construction for the nearest-known
  (t, value) endpoints.
- :func:`subbucket_with_tail` (here) — for TRAILING-ROWS-frame window
  functions (bounded EWMA, rolling median/sum: frames ``ROWS BETWEEN
  n-1 PRECEDING AND CURRENT ROW``): each (key, bucket)'s last ``tail``
  rows are duplicated as GHOST context rows into the key's next present
  bucket, so within-bucket frames see exactly the rows the global frame
  would.  EXACT iff every present (key, bucket) holds ≥ ``tail`` rows
  (ghosts cascade one bucket, not transitively) — the density
  precondition is naturally satisfied in the hot-key regime this
  mitigation exists for (you sub-bucket a key BECAUSE its buckets are
  huge); for uniform keys, don't sub-bucket.  Pinned in
  ``tests/test_seqbucket.py`` including a constructed violation of the
  precondition.

Cost/benefit is measured, not argued: ``tools/skew_probe.py`` claim 4
runs a 20%-hot bot-user corpus through plain and bucketed shapes
(BENCH_NOTES r12 §3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Measured per-key crossover (tools/skew_probe.py claim 4, BENCH_NOTES
#: r12 §3): one key's window sort is beaten by exact sub-bucketing past
#: ~3M rows for interpolate/EWMA-class windows (1.4–1.8× at 4M); asof's
#: crossover sits beyond local scale, and uniform keys pay 2.5–3×
#: overhead — which is why this is a per-hot-key SWITCH, never a default.
HOT_KEY_ROWS = 3_000_000

#: Bucket sizing target once a key IS hot: buckets of ~200k rows keep a
#: task's sort comfortably in memory while holding per-key bucket-spine
#: cardinality (the carry cascade's row count) in the low thousands even
#: for a 10⁹-row key.
TARGET_BUCKET_ROWS = 200_000


def recommend_bucket_width(
    df: DataFrame,
    key_cols: list[str] | str,
    on_col: str,
    hot_rows: int = HOT_KEY_ROWS,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
) -> float | None:
    """One-scan hot-key census → sub-bucket width recommendation, or
    ``None`` when no key crosses the measured crossover (the common case:
    don't sub-bucket).  Pass the result straight to
    ``merge_asof(bucket_width=…)`` / ``interpolate_linear(
    bucket_width_s=…)`` — output is bit-identical either way, so a None/
    width decision can never change results, only the plan.

    Cost at scale: one map-side-combined ``groupBy(key)`` aggregate
    (count + min/max of ``on_col``) — thin rows, one shuffle of distinct
    keys; the driver collect is bounded by construction (≤ corpus_rows /
    hot_rows keys can exceed the threshold).

    Width choice: for each hot key, the width that yields
    ``count / target_bucket_rows`` buckets across its observed time
    span; the minimum over hot keys is returned (the hottest key gets
    its target, cooler-but-still-hot keys get finer buckets — harmless,
    they are past the crossover too).  Units match what the operators
    take: SECONDS for timestamp ``on_col``, DAYS for date
    (``merge_asof`` buckets dates on the ``unix_date`` axis;
    ``interpolate_linear`` takes timestamps only), raw units for
    numerics.  Keys with a zero span are skipped (bucketing cannot
    split a single instant).  The decision is pinned on the probe's
    corpus shapes in ``tests/test_seqbucket.py``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    on_type = str(df.schema[on_col].dataType)
    if on_type.startswith("Timestamp"):
        axis = F.unix_micros(F.col(on_col)).cast("double") / 1e6
    elif on_type.startswith("Date"):
        # DAYS, not seconds: merge_asof's date axis is unix_date, so a
        # seconds-scaled width would make buckets 86400x finer than the
        # target (same output — widths never change results — but a
        # bucket-spine explosion, the exact perf failure this manages)
        axis = F.unix_date(F.col(on_col)).cast("double")
    else:
        axis = F.col(on_col).cast("double")
    hot = (
        df.groupBy(*keys)
        .agg(
            F.count("*").alias("__n"),
            F.min(axis).alias("__lo"),
            F.max(axis).alias("__hi"),
        )
        .filter(F.col("__n") >= hot_rows)
        .select("__n", (F.col("__hi") - F.col("__lo")).alias("__span"))
        .collect()
    )
    widths = [
        r["__span"] / max(r["__n"] / target_bucket_rows, 1.0)
        for r in hot
        if r["__span"] and r["__span"] > 0
    ]
    if not widths:
        return None
    return max(min(widths), 1e-9)


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with NULL-safe equality (``<=>``), keeping
    the left frame's key columns once.

    Spark's list-of-names join sugar compiles to plain ``=``, which drops
    every row whose key is NULL — in the sub-bucketing carry joins that
    silently loses left rows with NULL ``by`` keys or NULL ``on``/``ts``
    values (NULL ``__bkt``), while the unbucketed window path keeps them
    (ADVICE r12).  This helper is the drop-in replacement: same output
    shape as the sugar, NULL keys match NULL keys, so bucketed output
    stays bit-identical to the global window for any null pattern.
    """
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__nsj_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__nsj_{k}"))
        cond = c if cond is None else cond & c
    return left.join(r, cond, how).drop(*[f"__nsj_{k}" for k in keys])


def subbucket_with_tail(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    tail: int,
    bucket_of: Column,
    bucket_col: str = "__bkt",
    ghost_col: str = "__ghost",
) -> DataFrame:
    """Augment ``df`` with ``bucket_col`` (= ``bucket_of``, must be
    monotone in the window order) and ``ghost_col``, duplicating each
    (key, bucket)'s last ``tail`` rows (by ``order_cols``) into the key's
    next PRESENT bucket as ghost rows.

    Callers compute their trailing-frame window over
    ``Window.partitionBy(*key_cols, bucket_col).orderBy(*order_cols)``
    with a frame of at most ``tail`` preceding rows, then
    ``.filter(~F.col(ghost_col))`` and drop the helper columns — the
    result equals the global per-key window wherever every present
    (key, bucket) holds ≥ ``tail`` rows (see module docstring).
    """
    d = df.withColumn(bucket_col, bucket_of)
    # next PRESENT bucket per key (buckets may be sparse in time)
    spine = d.select(*key_cols, bucket_col).distinct()
    nxt = spine.withColumn(
        "__next_bkt",
        F.lead(bucket_col).over(
            Window.partitionBy(*key_cols).orderBy(bucket_col)
        ),
    )
    wb = Window.partitionBy(*key_cols, bucket_col).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    tails = (
        d.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") <= tail)
        .drop("__rn")
        .join(nxt, [*key_cols, bucket_col])
        .filter(F.col("__next_bkt").isNotNull())
        .withColumn(bucket_col, F.col("__next_bkt"))
        .drop("__next_bkt")
        .withColumn(ghost_col, F.lit(True))
    )
    return d.withColumn(ghost_col, F.lit(False)).unionByName(tails)
