"""Training-data pipeline operations (SURVEY.md §2.H extension): the
dataset-curation steps between raw corpus and training shards —
deterministic splits, stratified sampling, context-window packing,
PII redaction, vocabulary summarization.

Every computation is a JVM expression (md5 / regexp / window cumsum); the
oracles use the identical hash and regex semantics, so results match
bitwise.  Determinism policy: splits and samples hash content keys (never
``rand()``) — re-running on re-partitioned data gives identical
membership, the property a reproducible training run needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources import load_table
from .registry import query

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"

# hex-prefix thresholds over md5: uniform on [0, 256) per 2-hex-char prefix
_TRAIN_HEX = "e6"  # 230/256 ≈ 89.8 % train
_VAL_HEX = "f3"    # 243/256 ≈ 94.9 % cumulative → ~5.1 % val, ~5.1 % test


@query(
    "split_train_val_md5",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HEX}'
                  THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HEX}'
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 train/val/test split by md5(doc_id) hex-prefix
    compare — stable under re-partitioning, re-runs, and engine changes
    (both engines emit identical lowercase md5 hex), unlike ``rand(seed)``
    whose draw depends on partition layout.  Pure map-side: zero shuffles
    at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(prefix < _TRAIN_HEX, "train")
        .when(prefix < _VAL_HEX, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "sample_stratified_by_source",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE source NOT IN ('src0', 'src1')
       OR substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE source WHEN 'src0' THEN '33' WHEN 'src1' THEN '80' END
    """,
)
def sample_stratified_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling for data-mix reweighting:
    keep ~20 % of src0 (0x33/256), ~50 % of src1 (0x80/256), 100 % of
    everything else — membership by salted content hash, so the sample is
    reproducible row-for-row on any cluster layout (``sampleBy`` with
    seeded rand is not).  Pure map-side filter: pushdown-friendly, zero
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    threshold = (
        F.when(F.col("source") == "src0", "33")
        .when(F.col("source") == "src1", "80")
    )
    return docs.filter(
        ~F.col("source").isin("src0", "src1") | (prefix < threshold)
    ).select("doc_id", "source")


@query(
    "sample_temperature_sqrt",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM documents
    )
    SELECT doc_id, source
    FROM ranked
    WHERE rn <= CAST(ceil(sqrt(CAST(n_s AS DOUBLE)) * 4) AS BIGINT)
    """,
)
def sample_temperature_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (τ=0.5): keep ``ceil(sqrt(n_s)·4)``
    docs per source, so over-represented sources are downsampled toward
    the sqrt of their size — the standard temperature reweighting used to
    flatten a web-crawl source distribution before training.  Membership
    is the first k docs per source in md5(doc_id) hash order (tie-broken
    on doc_id): fully deterministic, and the k threshold is integral
    (sqrt is IEEE-exact in both engines, ×4 and ceil exact), so there is
    no float-boundary membership risk.

    Scale: one window shuffle on source (bounded cardinality).  The rank
    form is the exact-k oracle; at 100 TB the same mix is approximated
    map-side by hash-threshold keep probabilities (see
    sample_stratified_by_source) without the per-source sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n_s"),
    )
    k = F.ceil(F.sqrt(F.col("n_s").cast("double")) * 4).cast("bigint")
    return ranked.filter(F.col("rn") <= k).select("doc_id", "source")


@query(
    "pack_sequences_greedy",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_tok
      FROM t
    )
    SELECT doc_id, source, n_tokens, start_tok,
           CAST(floor(start_tok / 512.0) AS BIGINT) AS bin_first,
           CAST(floor((start_tok + n_tokens - 1) / 512.0) AS BIGINT) AS bin_last
    FROM c
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    doc_id order and cut into 512-token context windows; each doc reports
    its global token offset and the first/last window it lands in (the
    boundary map a packed-pretraining loader needs).

    Scale shape: the running offset is a cumsum window PARTITIONED BY
    SOURCE — each shard packs independently (exactly how 100 TB corpora
    are packed in practice), so no global-order single-partition window
    exists; one hash shuffle on source."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / 512.0).cast("bigint").alias("bin_first"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / 512.0)
        .cast("bigint")
        .alias("bin_last"),
    )


_EMAIL_RE = r"[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_redaction",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR)
               || '@mail.example.com or call 555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' . ' || COALESCE(text, '') AS body
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(length(
             regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g')
           ) AS BIGINT) AS redacted_chars,
           substr(
             regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g'), 1, 60
           ) AS redacted_head
    FROM synth
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and redact email addresses and phone numbers
    with JVM regexp_replace (no Python in the scan).  The synthetic corpus
    contains no organic PII, so a deterministic email+phone is injected
    per doc_id first — the regexes, counts, and replacement then exercise
    the real path and must match the oracle byte-for-byte.  The regex
    subset used (char classes, bounded repeats) behaves identically in
    Java regex and RE2."""
    docs = load_table(spark, sf_dir, "documents")
    body = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" . "),
        F.coalesce(F.col("text"), F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(body, F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(body, F.lit(_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_chars"),
        F.substring(redacted, 1, 60).alias("redacted_head"),
    )


@query(
    "top_terms_per_source",
    oracle=f"""
    WITH exploded AS (
      SELECT source, unnest({_TOKS}) AS term
      FROM documents WHERE text IS NOT NULL
    ),
    counted AS (
      SELECT source, term, COUNT(*) AS cnt
      FROM exploded GROUP BY source, term
    ),
    ranked AS (
      SELECT source, term, cnt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY cnt DESC, term) AS rank
      FROM counted
    )
    SELECT source, term, CAST(cnt AS BIGINT) AS cnt, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 vocabulary terms per source — the corpus-inspection query
    behind data-mix debugging.  Shape: explode → partial/final count agg
    (map-side combined, one shuffle on (source, term)) → per-source
    top-5 via ``salted_topk`` (r11): the (source, term) frame is
    VOCABULARY-scale per source (100M+ distinct terms per web source at
    100 TB) and sources are few — a bare per-source ranking window is
    the unsplittable hot-group sort; the two-round form sorts 1/16 per
    task then re-ranks ≤ 16·5 survivors, rows/ranks identical.  Ties
    break on term for determinism."""
    from ..operators.partitioning import salted_topk

    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counted = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    return salted_topk(
        counted, ["source"], [F.desc("cnt"), F.asc("term")], "term", 5
    ).select(
        "source",
        "term",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("rank").cast("bigint").alias("rank"),
    )


@query(
    "feature_minmax_scale",
    oracle="""
    WITH b AS (
      SELECT user_id,
             MIN(CAST(value AS DOUBLE)) AS lo,
             MAX(CAST(value AS DOUBLE)) AS hi
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN b.hi > b.lo
                THEN (CAST(e.value AS DOUBLE) - b.lo) / (b.hi - b.lo)
                ELSE CAST(0.5 AS DOUBLE) END AS value_scaled
    FROM events e JOIN b USING (user_id)
    """,
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key min-max feature scaling to [0,1] (the normalization step
    before a numeric column feeds a model); constant groups pin to 0.5
    instead of dividing by zero.

    Determinism: min/max are order-insensitive and the per-row rescale is
    one identical IEEE expression, so the RAW double is emitted unrounded
    — bit-identical in both engines (rounding to k decimals would
    actually HURT here: 2-decimal inputs make the quotient an exact
    rational, so .5 ties at the k-th decimal are common and the engines'
    tie-breaking differs; measured at sf1).  Scale shape: one grouped aggregate + one co-partitioned join
    back (both keyed on user_id); at 100 TB the bounds frame is
    key-cardinality and AQE broadcasts it when small."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("double")
    )
    b = ev.groupBy("user_id").agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    scaled = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")),
    ).otherwise(F.lit(0.5))
    return ev.join(b, "user_id").select(
        "event_id", "user_id", scaled.alias("value_scaled")
    )


@query(
    "sample_weighted_wor",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) + 1 AS DOUBLE) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS k
      FROM documents
    )
    SELECT doc_id, n_chars FROM keyed
    ORDER BY k, doc_id LIMIT 100
    """,
)
def sample_weighted_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    draw 100 docs with probability proportional to length by ranking on
    the exponential key ``-ln(u)/w`` with the smallest keys winning —
    but with ``u`` derived from md5(doc_id) instead of ``rand()``, so
    the sample is deterministic, engine-independent, and stable under
    re-partitioning (the reproducible-training-mix requirement).  The
    first 8 md5 hex chars become a uniform on (0,1] via ``(v+1)/2³²⁺¹``
    — integer hex decode and a power-of-two-free division both engines
    evaluate identically (ties additionally broken on doc_id).

    Scale: pure map-side key computation + one top-k
    (TakeOrderedAndProject) — no shuffle of the corpus, no global sort;
    exactly the A-ES distributed reservoir shape."""
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
    u = (u32.cast("bigint") + 1).cast("double") / F.lit(4294967297.0)
    key = -F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(100)
        .select("doc_id", "n_chars")
    )
