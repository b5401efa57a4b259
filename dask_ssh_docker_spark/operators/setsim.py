"""Prefix-filtered set-similarity join (PPJoin-style, filter stage only).

The scale path for exact-threshold Jaccard pair finding: instead of the
all-pairs inverted-index self-join (quadratic in posting-list length —
``dedup.jaccard_pairs_exact``, the validation-scale baseline), each
document keeps only a short *prefix* of its shingle set under a global
rarity order, and only prefixes are joined.  The prefix-filter theorem
makes this LOSSLESS: if ``J(A,B) ≥ t`` and A's prefix holds its
``|A| − ceil(t·|A|) + 1`` rarest shingles, then A and B must share a
prefix shingle — so the candidate set is a strict superset of the true
pairs and exact verification restores equality.  The registered query's
DuckDB oracle is the all-pairs join, so the driver's value-hash check
proves the two plans produce identical output.

Threshold arithmetic is kept in exact integers (``t = t_num/t_den``,
``ceil(t·n) = (t_num·n + t_den − 1) div t_den``): a float ``ceil(0.6·n)``
can round UP past the true bound and silently shrink the prefix below the
lossless minimum.

Shape at 100 TB: the rarity order is (shingle_df, shingle) — computed
per-document with a window over the doc's own shingles after joining the
shingle-frequency table, so NO global rank/sort of the dictionary is ever
materialized.  Shuffled volume: the shingle-df aggregation (bounded by
vocabulary), one window keyed by doc id, and a prefix×prefix equijoin
whose posting lists are prefix-length-bounded; the verify join touches
candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingle_rows


def setsim_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    t_num: int,
    t_den: int,
    shingle_k: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard) pairs with ``J ≥ t_num/t_den`` via prefix
    filtering + exact verify.  Output is identical to
    ``jaccard_pairs_exact(df, ..., threshold=t_num/t_den)``."""
    # (id, shingle) feeds FOUR consumers (sizes, rarity positions, and
    # both verify sides) — persist so tokenize+shingle+distinct runs once,
    # not once per consumer.  MEMORY_AND_DISK: at 100 TB this frame is
    # corpus-sized; spilling partitions beats recomputing the explode.
    sh = shingle_rows(df, text_col, id_col, shingle_k).distinct().persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    # Rarity order: ascending document frequency, shingle text tiebreak.
    sh_df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    pos_w = Window.partitionBy("id").orderBy("__df", "shingle")
    positioned = (
        sh.join(sh_df, "shingle")
        .join(sizes, "id")
        .select(
            "id",
            "shingle",
            "n_sh",
            F.row_number().over(pos_w).alias("__pos"),
        )
    )
    # prefix size p = n − ceil(t·n) + 1, in exact integer arithmetic
    ceil_tn = F.floor(
        (F.lit(t_num) * F.col("n_sh") + F.lit(t_den - 1)) / F.lit(t_den)
    )
    prefix = positioned.filter(
        F.col("__pos") <= F.col("n_sh") - ceil_tn + F.lit(1)
    ).select("id", "shingle", "n_sh")

    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: J ≥ t needs t·max(n_a,n_b) ≤ min(n_a,n_b);
            # exact-integer form of the size-ratio pruning rule
            & (
                F.lit(t_den) * F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                >= F.lit(t_num) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Exact verification over candidates only: equijoin on (pair id,
    # shingle) so only matching shingles materialize, never the per-pair
    # cartesian of the two sets.
    fa = sh.select(F.col("id").alias("id_a"), F.col("shingle").alias("__s"))
    fb = sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("__s"))
    common = (
        cands.join(fa, "id_a")
        .join(fb, ["id_b", "__s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac_raw = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("__raw", jac_raw)
        .filter(F.col("__raw") >= F.lit(t_num) / F.lit(t_den))
        .select("id_a", "id_b", F.round("__raw", 6).alias("jaccard"))
    )
