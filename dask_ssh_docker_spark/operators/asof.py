"""As-of (nearest) join — ``dd.merge_asof`` equivalent (SURVEY.md §2.D).

The Dask surface reachable through the reference exposes
``dd.merge_asof(left, right, on=, by=, direction=, tolerance=,
allow_exact_matches=)`` [Dask public API, anchor
``/root/reference/dask_ssh_docker/__init__.py:307``].  Spark has no
built-in; a naive range-join + rank explodes (every left row pairs with all
earlier right rows before ranking).  We use the **union + ordered-window
fill** rewrite instead:

1. tag rows ``side=0`` (right) / ``side=1`` (left) and union them on the
   shared ``(by, on)`` axis, right's payload packed into ONE struct column
   (so the fill is a single window expression, not one per column);
2. one shuffle: window ``partitionBy(by).orderBy(on, side, tiebreak)``;
   ``last(payload, ignorenulls=True)`` fills each left row with the most
   recent right payload at-or-before it (backward);
3. keep left rows; optionally null out fills outside ``tolerance``.

Cost at scale: exactly one shuffle of |L|+|R| rows keyed by ``by`` — the
same cost as a co-partitioned join, with per-key sorted state never
materializing candidate pairs.  Skewed ``by`` keys are handled by AQE skew
splitting only at shuffle; a pathological single-key dataset degrades to a
single-partition sort (documented limitation, same as Dask's).

Direction semantics (pandas-compatible):
- ``backward``: greatest right ``on`` <= left ``on``   (ties: exact match
  allowed unless ``allow_exact_matches=False``)
- ``forward``:  smallest right ``on`` >= left ``on``
- ``nearest``:  closer of the two; equidistant → backward wins.

Among duplicate right keys at the same ``on`` value the winner is the row
*latest* in ``tiebreak`` order for ``backward`` and *earliest* for
``forward`` (the orderings are mirror images); pass a unique right column
for determinism — pandas keeps the last occurrence in input order, which
is not a distributed-friendly contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dask_ssh_docker_spark.operators.seqbucket import null_safe_join


def _as_list(x) -> list[str]:
    if x is None:
        return []
    if isinstance(x, str):
        return [x]
    return list(x)


def _ord_num(c: Column, on_type: str) -> Column:
    """Exact numeric axis for the ``on`` column (micros for timestamps,
    days for dates — the same integer axes the nearest-direction distance
    uses)."""
    if on_type.startswith("Timestamp"):
        return F.unix_micros(c)
    if on_type.startswith("Date"):
        return F.unix_date(c)
    return c.cast("double")


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_right",
    tiebreak: str | None = None,
    bucket_width: int | float | None = None,
) -> DataFrame:
    """As-of join ``left`` with ``right`` on ordered column ``on`` within
    optional ``by`` groups.  Returns all left rows + right payload columns
    (suffixed on name clash) + ``<on><suffix>`` (the matched right ``on``,
    null when unmatched).

    ``tolerance``: max allowed |left.on - right.on| — an interval-literal
    Column for timestamps (e.g. ``F.expr("INTERVAL 5 MINUTES")``) or a
    number for numeric ``on``; matches farther than that are nulled.

    ``bucket_width`` (r12, SCALE.md class-7 mitigation): time-range
    sub-bucketing for hot ``by`` keys.  The per-key ordered fill is
    inherently one window partition — a bot key with 10⁸ rows is one
    task's sort.  With ``bucket_width`` set (SECONDS for timestamp
    ``on``, DAYS for date, raw units for numeric), the window partitions
    on ``(by, floor(on/width))`` instead, and cross-bucket context is
    restored exactly: the per-(key, bucket) LAST/FIRST right payload is a
    map-side-combinable ``max_by``/``min_by`` aggregate, cascaded over
    the (bounded) per-key bucket spine, and coalesced under the
    within-bucket fill.  Output is BIT-IDENTICAL to the unbucketed shape
    for any width — payloads are copied, never recomputed — pinned in
    ``tests/test_seqbucket.py``.  Costs one extra thin-row shuffle (the
    carry join); measured in ``tools/skew_probe.py`` claim 4.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    by_cols = _as_list(by)

    left_cols = left.columns
    payload_cols = [c for c in right.columns if c != on and c not in by_cols]
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in payload_cols
    }
    matched_on = on + suffix

    # --- unified frame: left rows carry their payload, right rows carry
    # (by, on, packed struct).  side: right=0 sorts before left=1 at equal
    # `on` => exact matches visible to `last(...)` fills.
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r_struct = F.struct(
        F.col(on).alias("__on"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r_side = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__ord"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        r_struct.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols
          if c not in by_cols and c != on],
    )
    l_side = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r_side.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in by_cols and c != on],
    )
    unioned = r_side.unionByName(l_side)

    on_type = str(left.schema[on].dataType)
    if bucket_width is not None:
        units = (
            bucket_width * 1_000_000
            if on_type.startswith("Timestamp")
            else bucket_width
        )
        unioned = unioned.withColumn(
            "__bkt", F.floor(_ord_num(F.col("__ord"), on_type) / F.lit(units))
        )
        part = Window.partitionBy(*by_cols, "__bkt")
        # Cross-bucket carries: per (key, bucket), the LAST right payload
        # under the within-bucket order (backward candidates) and the
        # FIRST (forward candidates) — map-side-combinable aggregates, so
        # no task ever holds a hot key's row volume.  The cascade over
        # buckets runs on the per-key bucket SPINE (|keys|·|buckets|
        # rows), not the data.
        spine = unioned.select(*by_cols, "__bkt").distinct()
        # Tiebreak ordering must mirror the within-bucket window's:
        # backward fills order asc_nulls_first(__tb) (last = largest
        # non-null __tb) — max_by over struct(__ord, __tb) already treats
        # a NULL field as smallest, so it matches.  Forward fills order
        # desc_nulls_first(__tb) (last = SMALLEST NON-NULL __tb), but a
        # bare min_by would treat NULL as smallest and pick the NULL-__tb
        # row — so the min_by key carries an isNull flag that pushes NULL
        # tiebreaks after every non-null one (ADVICE r12).
        rb = (
            unioned.filter(F.col("__side") == 0)
            .groupBy(*by_cols, "__bkt")
            .agg(
                F.max_by("__payload", F.struct("__ord", "__tb")).alias("__lastp"),
                F.min_by(
                    "__payload",
                    F.struct(
                        F.col("__ord"),
                        F.col("__tb").isNull().alias("__tbn"),
                        F.col("__tb"),
                    ),
                ).alias("__firstp"),
            )
        )
        wprev = (
            Window.partitionBy(*by_cols)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # strictly-after cascade as a DESC running frame — Spark's
        # following-unbounded frames re-scan per row (O(group²)); the
        # spine groups are bucket-count-bounded so this is hygiene here,
        # but interpolate.py documents the measured cliff
        wnext = (
            Window.partitionBy(*by_cols)
            .orderBy(F.desc("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # Both carry joins are NULL-SAFE: NULL `by` keys and NULL `on`
        # values (NULL __bkt) are real rows the unbucketed window keeps —
        # a plain equi-join would silently drop them (ADVICE r12); the
        # null-safe form preserves the 'returns all left rows' contract
        # and the bit-identical-for-any-width claim.
        carries = null_safe_join(spine, rb, [*by_cols, "__bkt"], "left").select(
            *by_cols,
            "__bkt",
            F.last("__lastp", ignorenulls=True).over(wprev).alias("__carry_b"),
            F.last("__firstp", ignorenulls=True).over(wnext).alias("__carry_f"),
        )
        unioned = null_safe_join(unioned, carries, [*by_cols, "__bkt"])
    else:
        part = Window.partitionBy(*by_cols) if by_cols else Window.partitionBy()

    def fill(backward: bool, exact_ok: bool) -> Column:
        # backward: right-before-left at equal ts iff exact matches allowed.
        side_order = F.asc("__side") if exact_ok else F.desc("__side")
        if backward:
            w = part.orderBy(F.asc("__ord"), side_order, F.asc_nulls_first("__tb"))
        else:
            w = part.orderBy(F.desc("__ord"), side_order, F.desc_nulls_first("__tb"))
        within = F.last("__payload", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        if bucket_width is None:
            return within
        # sub-bucketed: a bucket with no in-direction right row falls
        # back to the cascaded cross-bucket carry (an exact copy of the
        # payload the global window would have filled).  Equal `on`
        # values share a bucket, so exact-match semantics stay entirely
        # within-bucket; carried rows are strictly out-of-bucket and
        # therefore strictly before/after every row here.
        return F.coalesce(within, F.col("__carry_b" if backward else "__carry_f"))

    if direction == "backward":
        filled = fill(True, allow_exact_matches)
    elif direction == "forward":
        filled = fill(False, allow_exact_matches)
    else:  # nearest: evaluate both fills, pick closer (tie -> backward)
        b, f_ = fill(True, allow_exact_matches), fill(False, allow_exact_matches)
        on_type = str(left.schema[on].dataType)
        is_ts = on_type.startswith("Timestamp")
        is_date = on_type.startswith("Date")

        def num(c: Column) -> Column:
            # exact integer distance axis: micros for timestamps (a double
            # of epoch seconds has only ~16 sig digits — too coarse);
            # days for dates (date can't cast to double)
            if is_ts:
                return F.unix_micros(c)
            if is_date:
                return F.unix_date(c)
            return c.cast("double")

        dist_b = F.abs(num(F.col("__ord")) - num(b["__on"]))
        dist_f = F.abs(num(f_["__on"]) - num(F.col("__ord")))
        filled = (
            F.when(b.isNull(), f_)
            .when(f_.isNull(), b)
            .when(dist_f < dist_b, f_)
            .otherwise(b)
        )

    out = (
        unioned.withColumn("__fill", filled)
        .filter(F.col("__side") == 1)
    )

    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        lo, ro = F.col("__ord"), F.col("__fill")["__on"]
        dist = F.when(lo >= ro, lo - ro).otherwise(ro - lo)
        out = out.withColumn(
            "__fill", F.when(dist <= tol, F.col("__fill"))
        )

    return out.select(
        *[F.col(c) for c in by_cols],
        F.col("__ord").alias(on),
        *[F.col(c) for c in left_cols if c not in by_cols and c != on],
        F.col("__fill")["__on"].alias(matched_on),
        *[F.col("__fill")[c].alias(out_names[c]) for c in payload_cols],
    )
