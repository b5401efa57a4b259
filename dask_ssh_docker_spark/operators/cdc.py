"""Change-data-capture operators: MERGE-INTO upsert and SCD Type-2 build.

The reference engine's users maintain mutable snapshots with pandas-style
``DataFrame.update`` / ``combine_first`` idioms (Dask collection API per
SURVEY.md §2); warehouse-side the same job is ``MERGE INTO`` (Delta /
Iceberg) and slowly-changing-dimension history builds.  Both are
expressible as single-shuffle DataFrame plans — no table format needed:

- ``merge_upsert``: one full-outer shuffle join on the key; each side
  shuffles once, matched rows take the source image (WHEN MATCHED THEN
  UPDATE SET *), unmatched source rows insert (WHEN NOT MATCHED THEN
  INSERT *), unmatched target rows pass through.  At 100 TB this is the
  same plan Delta's MERGE executes (minus the file rewrite): shuffle
  both sides on the key, AQE handles skewed keys.
- ``scd2_from_changelog``: valid_from/valid_to intervals via one
  ``lead`` window per key — a single hash exchange on the key, then a
  per-key sort; no self-join, no driver state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``MERGE INTO target USING source ON keys WHEN MATCHED THEN UPDATE
    SET * WHEN NOT MATCHED THEN INSERT *`` — returned as the post-merge
    snapshot.

    ``source`` must carry the same columns as ``target``.  Whole-row
    semantics: if a source row matches, ALL its column values win (even
    NULLs) — hence the key-presence test rather than per-column
    ``coalesce``.

    Scale shape: one full-outer sort-merge join; both sides shuffle once
    on the key.  Broadcast is deliberately not hinted — a CDC batch can
    be arbitrarily large; AQE will broadcast small sources on its own.
    """
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing target columns: {missing}")
    t, s = target.alias("t"), source.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
    matched = F.col(f"s.{keys[0]}").isNotNull()
    cols = []
    for c in target.columns:
        if c in keys:
            cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
    return t.join(s, cond, "full_outer").select(*cols)


def scd2_from_changelog(
    changes: DataFrame,
    key: str,
    ts_col: str,
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change log: each change row
    becomes a version with ``valid_from`` = its timestamp, ``valid_to`` =
    the next change's timestamp for the same key (NULL for the current
    version), plus an ``is_current`` flag.

    ``order_extra`` columns break timestamp ties so the interval chain is
    total and deterministic.

    Scale shape: one window (= one hash exchange on ``key`` + per-key
    sort).  State is bounded by the widest single key's history, never
    the table.
    """
    w = Window.partitionBy(key).orderBy(ts_col, *order_extra)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshot frames (same schema) into a change set: one row
    per key present in either side, tagged ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, any compared column
    differs — null-safe), or ``unchanged``.  The inverse of
    :func:`merge_upsert`: ``merge_upsert(old, diff-derived source)``
    reproduces ``new``.

    Scale shape: one full-outer shuffle join on the key; comparisons are
    map-side null-safe equality — no hashing, no driver state.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o, n = old.alias("o"), new.alias("n")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    cols = [F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    return o.join(n, cond, "full_outer").select(*cols, change_type.alias("change_type"))
