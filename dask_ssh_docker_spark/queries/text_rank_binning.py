"""TF-IDF term ranking, histogram binning, and time interpolation
(SURVEY.md §2.H text analysis depth, §2.E binning, §2.I interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.interpolate import interpolate_linear
from ..sources import load_table
from .registry import query

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS cnt,
             MAX(len) OVER (PARTITION BY doc_id) AS doc_len
      FROM (SELECT doc_id, unnest(toks) AS term, len(toks) AS len FROM base)
      GROUP BY doc_id, term, len
    ),
    df_ AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM base),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round((CAST(cnt AS DOUBLE) / CAST(doc_len AS DOUBLE))
                   * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
      FROM tf JOIN df_ USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf from exploded tokens (one
    shuffle), document frequency from a grouped count (broadcast back),
    ranking window per doc.  The classic inverted-index scoring shape."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens as _tokens

    toks = docs.select("doc_id", _tokens("text").alias("t"))
    exploded = toks.select(
        "doc_id", F.size("t").alias("doc_len"), F.explode("t").alias("term")
    )
    tf = exploded.groupBy("doc_id", "doc_len", "term").agg(F.count("*").alias("cnt"))
    # tf feeds BOTH the df derivation and the scoring join.  Earlier
    # shape used a lazy localCheckpoint to avoid tokenizing twice; r10
    # replaces it with exchange/stage reuse — strictly better at 100×
    # (no corpus-scale local-disk materialization on top of the shuffle
    # files that exist anyway, and no lost-executor recompute hazard).
    # Two details make the branches' (doc_id, doc_len, term) exchanges
    # canonically identical so AQE's stage cache computes the tokenize +
    # count once (plan-pinned: ReusedExchange in the executed plan):
    #  - df references the cnt output (`cnt >= 1` is always true for a
    #    count(*), so this IS the distinct-doc count: tf is keyed by
    #    (doc_id, ..., term), one row per doc per term) — without the
    #    reference, column pruning narrows this branch's partial
    #    aggregate to (doc_id, term) and the subtrees stop matching.
    #    SCHEMA CONTRACT (ADVICE r10): the count==countDistinct rewrite
    #    additionally requires doc_id to be UNIQUE in documents — a
    #    duplicate doc_id with different text would contribute two
    #    (doc_id, doc_len, term) rows and over-count df vs the oracle's
    #    COUNT(DISTINCT doc_id).  Pinned by
    #    tests/test_schema_policy.py::test_documents_doc_id_unique;
    #  - no countDistinct (its Expand would likewise diverge the plan,
    #    and it double-scans the exchange for nothing here).
    # Measured sf1 warm: 3.9-4.4 s vs 5.8-8.5 s for the checkpoint shape.
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("cnt") >= 1, True)).alias("df")
    )
    # n_docs as a broadcast 1-row aggregate (mirrors the oracle's CROSS
    # JOIN n) — keeps the plan lazy and single-scan instead of an eager
    # docs.count() driver action at query-build time
    n = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    # dfreq (one row per distinct corpus term) grows without bound on web
    # text — NEVER force-broadcast it.  Left unhinted, AQE broadcasts it at
    # small scale and falls back to a shuffle join past the size threshold.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("cnt").cast("double") / F.col("doc_len").cast("double"))
                * F.log(F.col("__n_docs") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "histogram_order_prices",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (50k-wide buckets) via explicit floor binning
    (DuckDB has no ``width_bucket``; Spark's is pinned against this
    formula in tests/test_approx_io_concat.py)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "interpolate_time_linear",
    oracle="""
    WITH masked AS (
      SELECT user_id, event_id, epoch_us(ts) * 1.0 AS t,
             CASE WHEN value >= 25 THEN value END AS v
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, t, v,
        LAST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        FIRST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY t
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM masked
    )
    SELECT user_id, event_id,
      CASE WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           WHEN nt = pt THEN pv
           ELSE pv + (nv - pv) * ((t - pt) / (nt - pt)) END AS value_interp
    FROM w
    """,
)
def interpolate_time_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time interpolation of masked values (value<25 → null) per
    user — identical window arithmetic in the oracle, so doubles match
    bitwise."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("value") >= 25, F.col("value")).alias("value"),
    )
    out = interpolate_linear(ev, "ts", "value", by="user_id", out_col="value_interp")
    return out.select("user_id", "event_id", "value_interp")


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    chunked AS (
      SELECT doc_id, len(toks) AS n_tokens,
             unnest(list_transform(
               generate_series(0, greatest(CAST(ceil((len(toks) - 50) / 25.0) AS INT), 0)),
               i -> array_to_string(toks[(i*25+1):(i*25+50)], ' ')
             )) AS chunk_text,
             unnest(generate_series(0, greatest(CAST(ceil((len(toks) - 50) / 25.0) AS INT), 0)))
               AS chunk_idx
      FROM base
    )
    SELECT doc_id, chunk_idx, n_tokens,
           length(chunk_text) AS chunk_chars,
           len(string_split(chunk_text, ' ')) AS chunk_tokens
    FROM chunked
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 50-token windows, stride 25 (50% overlap)
    — one output row per chunk with its stats (the shape a training-data
    tokenization pipeline feeds downstream)."""
    from ..functions.text import chunk_token_windows, tokens

    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens("text").alias("__t"))
    chunked = staged.select(
        "doc_id",
        F.size("__t").cast("bigint").alias("n_tokens"),
        F.posexplode(chunk_token_windows(F.col("__t"), 50, 25)).alias(
            "chunk_idx", "chunk_text"
        ),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "n_tokens",
        F.length("chunk_text").cast("bigint").alias("chunk_chars"),
        F.size(F.split("chunk_text", " ")).cast("bigint").alias("chunk_tokens"),
    )
