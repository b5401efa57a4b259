"""Embedding-column analytics (SURVEY.md §2.H extensions): norm audits,
per-label centroids, int8 quantization quality — the bookkeeping a
training pipeline runs over an `array<float>` column before/after ANN
indexing or model ingest.

Determinism: per-element IEEE ops are written in the identical order in
Spark and DuckDB (``F.aggregate`` folds left, matching DuckDB's
``list_aggregate``); cross-row float sums differ in accumulation order by
~1e-14 relative — far below the 6-decimal hash normalization.  Exact
comparisons (max-abs scale, floor-based quantization, integer counts) are
bit-identical.

Scale notes (100 TB): all three queries posexplode/transform JVM-side
(no Python), aggregate with map-side partials, and output O(labels)
rows.  The explode shuffles rows×dim tuples — the honest distributed
vector reduction; per-partition numpy partial sums via mapInPandas would
cut the shuffle by ~dim× and is the documented upgrade path if the
centroid pass ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _norm_expr(col: str):
    """sqrt(sum(x^2)) with a left fold — same operand order as DuckDB's
    list_aggregate, so the doubles are bit-identical per row."""
    sq = F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x))


@query(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vectors,
           SUM(nrm) / COUNT(*) AS avg_norm,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
    FROM n GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm audit — the first sanity check before cosine ANN
    (un-normalized or degenerate vectors surface here)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("nrm", _norm_expr("embedding"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum("nrm") / F.count("*")).alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


@query(
    "embedding_centroids_by_label",
    oracle="""
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    ), m AS (
      SELECT label, pos, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS mv,
             COUNT(*) AS cnt
      FROM e GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list_transform(list(mv ORDER BY pos),
                                          x -> printf('%.6f', x)), '|')
             AS centroid,
           MIN(cnt) AS n_vectors
    FROM m GROUP BY label
    """,
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean vector per label, assembled back into an ordered array — the
    seed computation for IVF coarse quantizers and class prototypes.
    posexplode → (label, pos) partial-agg'd mean → ordered re-assembly;
    every step JVM-side.

    Result-schema policy: the centroid array is serialized with
    ``'%.6f'`` formatting + ``array_join`` at the query boundary (the
    driver's canonicalizer cannot hash list cells); printf-style
    formatting of identical doubles is engine-independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos0", "fv")
    ).select("label", (F.col("pos0") + 1).alias("pos"), F.col("fv").cast("double").alias("v"))
    m = e.groupBy("label", "pos").agg(
        (F.sum("v") / F.count("*")).alias("mv"), F.count("*").alias("cnt")
    )
    return m.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: F.format_string("%.6f", s.getField("mv")),
            ),
            "|",
        ).alias("centroid"),
        F.min("cnt").alias("n_vectors"),
    )


@query(
    "embedding_quantize_int8_stats",
    oracle="""
    WITH e AS (
      SELECT label, unnest(embedding) AS fv FROM embeddings
    ), s AS (
      SELECT label, MAX(ABS(CAST(fv AS DOUBLE))) AS scale FROM e GROUP BY label
    ), qq AS (
      SELECT e.label, CAST(fv AS DOUBLE) AS v, scale,
             GREATEST(-127, LEAST(127,
               CAST(FLOOR(CAST(fv AS DOUBLE) / scale * 127 + 0.5) AS INTEGER))) AS q
      FROM e JOIN s ON e.label = s.label
    )
    SELECT label, COUNT(*) AS n_elems,
           CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS zero_frac,
           CAST(SUM(CASE WHEN ABS(q) = 127 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS sat_frac,
           1000000.0 * (SUM((v - q * scale / 127) * (v - q * scale / 127))
                        / COUNT(*)) AS mse_ppm
    FROM qq GROUP BY label
    """,
)
def embedding_quantize_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization quality per label: zero-collapse and
    saturation fractions plus reconstruction MSE (scaled to ppm so the
    6-decimal hash keeps real signal).  The max-abs scale is exact (picks
    an element); floor-based rounding avoids engine rounding-mode
    differences; the per-label scale joins back as a broadcast-size
    frame (O(labels) rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.explode("embedding").alias("fv")).select(
        "label", F.col("fv").cast("double").alias("v")
    )
    s = e.groupBy("label").agg(F.max(F.abs(F.col("v"))).alias("scale"))
    qq = e.join(s, "label").withColumn(
        "q",
        F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(F.col("v") / F.col("scale") * 127 + 0.5).cast("int"),
            ),
        ),
    )
    err = F.col("v") - F.col("q") * F.col("scale") / 127
    return qq.groupBy("label").agg(
        F.count("*").alias("n_elems"),
        (
            F.sum(F.when(F.col("q") == 0, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("zero_frac"),
        (
            F.sum(F.when(F.abs(F.col("q")) == 127, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("sat_frac"),
        (F.lit(1000000.0) * (F.sum(err * err) / F.count("*"))).alias("mse_ppm"),
    )


# This module ships closures to Python workers; make them self-contained
# (see functions/shipping.py — no package install needed on executors).
from ..functions.shipping import ship_module_by_value as _ship

_ship(__name__)
