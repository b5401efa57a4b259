"""Mergeable-summary sketch operators: two-pass exact heavy hitters.

Finding every key whose frequency exceeds a threshold (heavy hitters /
frequent items — dominant domains, over-represented tokens, hot users) is
a core training-data audit.  The naive plan — ``groupBy(key).count()``
then filter — shuffles the *entire distinct-key domain*, which at 100 TB
(billions of URLs, trillions of tokens) is exactly the shuffle you cannot
afford when only the tiny heavy tail is wanted.

The classic scale answer (Misra–Gries '82; mergeable-summaries form of
Agarwal et al., PODS '12) is a two-pass plan:

1. **Candidate pass (narrow, no key-domain shuffle):** each partition
   summarizes its rows with a Misra–Gries sketch of ``k`` counters inside
   ``mapInPandas`` (Arrow-batched; the generator keeps one dict per
   partition across batches).  MG guarantees every key with *local*
   frequency > n_p/(k+1) retains a positive counter; by averaging, any
   key with *global* frequency > n/(k+1) must exceed the local threshold
   in at least one partition, so the union of per-partition candidates is
   a **superset of every true heavy hitter**.  Only ≤ k·P candidate keys
   ever leave the executors.
2. **Exact recount (small, provably sufficient):** broadcast-semi-join
   the fact rows to the candidate set, ``groupBy`` the surviving rows
   (≤ the heavy keys' rows), and keep keys with ``count·(k+1) > n``.
   The integer cross-multiplication avoids any float threshold; the
   output is byte-identical to the naive full-domain plan — which is what
   the DuckDB oracle (plain GROUP BY/HAVING) checks.

At 100 TB the first pass is map-only (one scan, k counters per
partition); the second shuffles only rows carrying candidate keys.
Nothing resembling the distinct-key domain is ever shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_trim(counters: dict, k: int) -> None:
    """Reduce to ≤ k counters by the batched Misra–Gries decrement: subtract
    the (m−k)-th smallest count from every counter and drop the non-positive
    ones (equivalent to (m−k) rounds of the classic decrement-all step)."""
    m = len(counters)
    if m <= k:
        return
    counts = sorted(counters.values())
    t = counts[m - k - 1]  # (m−k)-th smallest
    for key in [key for key, c in counters.items() if c <= t]:
        del counters[key]
    for key in counters:
        counters[key] -= t


def misra_gries_candidates(df: DataFrame, key: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries → one ``key`` column of candidate
    heavy-hitter keys (≤ k per partition, distinct across partitions).

    Superset guarantee: contains every key with global frequency
    > n/(k+1).  Counts are NOT returned — MG counters are lower bounds
    with partition-order-dependent slack; callers needing counts do the
    exact recount (``heavy_hitters``), keeping this operator
    deterministic in *set* terms only, which is all the guarantee gives.
    """
    spark_type = dict(df.dtypes)[key]

    # The task closure must be fully self-contained (trim logic nested, no
    # module-global references): plain driver sessions — the external
    # driver's own SparkSession, spark-submit without --py-files — cannot
    # import this package on executors, and cloudpickle ships nested
    # functions by value but module-level functions by reference.
    # Mirror of ``_mg_trim`` (unit-tested at module level).
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side import, not a driver global

        def trim(counters: dict) -> None:
            m = len(counters)
            if m <= k:
                return
            counts = sorted(counters.values())
            t = counts[m - k - 1]
            for key_ in [key_ for key_, c in counters.items() if c <= t]:
                del counters[key_]
            for key_ in counters:
                counters[key_] -= t

        counters: dict = {}
        for batch in batches:
            for val, cnt in batch[key].value_counts(dropna=True).items():
                counters[val] = counters.get(val, 0) + int(cnt)
            trim(counters)
        # Empty partitions (or all-null batches) must yield NOTHING:
        # pd.array([]) infers a Float64 masked dtype and the Arrow
        # serializer then rejects it against a string schema (hit on the
        # sf1 layout, where one input split carries no rows).
        if counters:
            yield pd.DataFrame({key: pd.array(list(counters.keys()))})

    return df.select(key).mapInPandas(summarize, schema=f"{key} {spark_type}").distinct()


def heavy_hitters(df: DataFrame, key: str, k: int) -> DataFrame:
    """Exact heavy hitters: every ``key`` value with frequency
    > n/(k+1), with its exact count — identical output to the naive
    full-domain ``groupBy``/filter, computed without shuffling the
    distinct-key domain (see module docstring for the two-pass plan).

    Returns (key, n_key) sorted nowhere (caller orders).
    """
    candidates = misra_gries_candidates(df, key, k)
    # Broadcast is sound: ≤ k × num_partitions candidate keys by
    # construction, independent of data volume.
    recount = (
        df.join(F.broadcast(candidates), on=key, how="left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_key"))
    )
    total = df.select(F.count(F.lit(1)).alias("n_total"))
    # 1-row aggregate broadcast (same pattern as the qcut/TF-IDF global
    # aggregates); integer cross-multiply avoids float thresholds.
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("n_key") * (k + 1) > F.col("n_total"))
        .select(key, "n_key")
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
