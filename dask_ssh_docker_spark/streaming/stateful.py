"""Custom stateful streaming operators — ``applyInPandasWithState``
(SURVEY.md §2.H: "applyInPandasWithState for custom stateful operators").

The escape hatch when watermarked windows can't express the state machine:
arbitrary per-key state carried across micro-batches, Arrow-batched.
State size is the scale knob — keep per-key state O(1) (aggregates,
last-seen markers), never per-event history, and use timeouts to evict
dead keys on real streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) carried across micro-batches.

    Emits one updated row per user per batch — the streaming analog of an
    ever-growing ``groupBy(user).agg(count, sum)``; after all batches the
    latest row per user equals the global batch aggregate (pinned in
    tests/test_stateful.py by feeding the same data in 2 batches).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(stream: DataFrame, alpha: float = 0.1) -> DataFrame:
    """Per-user streaming EWMA (recursive ``s ← (1-α)s + αx``), state =
    one double per key — the O(1)-state online form of the batch
    ``window_ewma_bounded`` query.  Events are folded in event-time order
    WITHIN each micro-batch (sorted on ts, then event_id); cross-batch
    order is the stream's arrival order, the standard online-EWMA
    semantics.  Emits the post-batch smoothed value per user.

    Pinned in tests/test_stateful.py: feeding the whole table in one
    batch reproduces the exact batch-side recursive fold per user.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (s, n) = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"].astype(float):
                s = x if s is None else (1.0 - alpha) * s + alpha * x
                n += 1
        state.update((s, n))
        yield pd.DataFrame({"user_id": [user_id], "ewma": [s], "n_seen": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, ewma double, n_seen long",
        stateStructType="ewma double, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_cap_per_key(
    stream: DataFrame,
    n: int,
    key: str = "user_id",
) -> DataFrame:
    """Per-key quota cap: emit at most ``n`` events per key across the
    stream's lifetime (events ranked by event time, ties on event_id) —
    the streaming form of the curation primitive "keep at most N
    documents per domain / events per user".

    State = one counter per key (O(1)); within each micro-batch rows are
    folded in (ts, event_id) order, so with a single availableNow batch
    the emitted set equals the batch ``row_number() OVER (PARTITION BY
    key ORDER BY ts, event_id) <= n`` exactly (the driver oracle for
    ``stream_rate_cap_user``).  Across multiple batches the cap applies
    in arrival order — the documented online semantics.

    NB ``transformWithStateInPandas`` (the Spark 4 successor API) needs
    the protobuf Python package at runtime; this implementation stays on
    ``applyInPandasWithState``, which is dependency-free.
    """

    def update(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side import (plain-session safe)

        (seen,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            take = pdf.head(max(0, n - seen))
            seen += len(pdf)
            if len(take):
                yield take[["user_id", "event_id", "ts"]]
        state.update((seen,))

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType="user_id long, event_id long, ts timestamp",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
