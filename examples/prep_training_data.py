"""End-to-end LLM training-data prep pipeline (SURVEY.md §2.H composed):

    raw documents
      → exact dedup (md5 content groups, keep min id)
      → quality filter (composite score ≥ threshold)
      → Gopher-style repetition gate (top-word fraction)
      → language filter (marker-based lang-ID)
      → benchmark decontamination (broadcast eval 8-gram set)
      → MinHash-LSH near-dup clustering (keep canonical per cluster)
      → temperature-scaled source mixing (sqrt reweighting, τ=0.5)
      → 50-token overlap chunking
      → curated chunks written to parquet

Run:  PYTHONPATH=. python -m dask_ssh_docker_spark.runner \
          examples/prep_training_data.py -- [sf_dir] [out_dir]

Every stage is a declarative DataFrame rewrite from the operator library —
the same composition works unchanged at cluster scale (each stage's 100 TB
cost is documented in SCALE.md).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    spark = SparkSession.getActiveSession()
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else tempfile.mkdtemp(prefix="curated_")

    from dask_ssh_docker_spark.functions.text import (
        chunk_token_windows,
        lang_id,
        quality_score,
        tokens,
    )
    from dask_ssh_docker_spark.functions.text import word_kgrams_from_tokens
    from dask_ssh_docker_spark.operators.dedup import exact_dedup, minhash_dedup

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = raw.count()

    # 0. split off the eval/benchmark set FIRST (docs 0-9 stand in).  Its
    # 8-grams must come from the RAW docs — deriving them after the
    # quality/lang gates would silently unscreen any eval doc those gates
    # drop.  (Tokens materialized before the nested lambdas: CSE.)
    def kgrams(frame):
        return frame.select("doc_id", tokens("text").alias("__t")).select(
            "doc_id", F.explode(word_kgrams_from_tokens(F.col("__t"), 8)).alias("g")
        )

    eval_grams = kgrams(raw.filter(F.col("doc_id") < 10)).select("g").distinct()
    docs = raw.filter(F.col("doc_id") >= 10)

    # 1. exact dedup (normalized content hash, min doc_id survives)
    docs = exact_dedup(docs, "text", "doc_id")
    n1 = docs.count()

    # 2-3. quality + language gates (one JVM-side projection, no shuffle)
    docs = docs.withColumn("quality", quality_score("text")).withColumn(
        "lang_pred", lang_id("text")
    )
    docs = docs.filter((F.col("quality") >= 0.5) & (F.col("lang_pred") != "und"))
    n2 = docs.count()

    # 3b. Gopher-style repetition gate: drop docs dominated by one token
    # ((doc,token) partial agg — the canonical map-side-combinable pass)
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    rep = (
        toks.groupBy("doc_id", "w").count()
        .groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("top_word_frac"))
    )
    docs = docs.join(
        rep.filter(F.col("top_word_frac") < 0.3).select("doc_id"), "doc_id", "left_semi"
    )
    n3 = docs.count()

    # 3c. decontamination: drop docs sharing an 8-gram with the eval set
    # (the tiny distinct eval-gram set broadcasts; no corpus shuffle)
    dirty = (
        kgrams(docs).join(F.broadcast(eval_grams), "g").select("doc_id").distinct()
    )
    docs = docs.join(dirty, "doc_id", "left_anti")
    n4 = docs.count()

    # 4. near-dup clustering; keep the canonical doc per cluster
    clusters = minhash_dedup(docs, "text", "doc_id", threshold=0.5)
    docs = docs.join(
        clusters.filter("is_canonical").select("id"),
        docs.doc_id == F.col("id"),
        "left_semi",
    )
    n5 = docs.count()

    # 4b. temperature-scaled source mixing (τ=0.5): flatten the source
    # distribution by keeping ceil(sqrt(n_s)·4) docs per source, first-k
    # in md5(doc_id) order (deterministic across reruns/layouts)
    from pyspark.sql import Window

    w_mix = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    docs = (
        docs.withColumn("__rn", F.row_number().over(w_mix))
        .withColumn("__n_s", F.count("*").over(Window.partitionBy("source")))
        .filter(
            F.col("__rn")
            <= F.ceil(F.sqrt(F.col("__n_s").cast("double")) * 4).cast("bigint")
        )
        .drop("__rn", "__n_s")
    )
    n5b = docs.count()

    # 5. chunk into overlapping context windows
    staged = docs.select("doc_id", "lang_pred", "quality", tokens("text").alias("__t"))
    chunks = staged.select(
        "doc_id",
        "lang_pred",
        "quality",
        F.posexplode(chunk_token_windows(F.col("__t"), 50, 25)).alias(
            "chunk_idx", "chunk_text"
        ),
    )
    chunks.write.mode("overwrite").parquet(out_dir)
    n6 = spark.read.parquet(out_dir).count()

    print(
        f"PIPELINE docs={n0} after_exact={n1} after_quality={n2} "
        f"after_gopher={n3} after_decontam={n4} after_neardup={n5} "
        f"after_tempmix={n5b} chunks={n6} out={out_dir}"
    )
    return 0
