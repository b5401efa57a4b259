"""Text-analysis queries on the documents table (SURVEY.md §2.H):
token stats, quality scoring, language-ID heuristic, fingerprinting.

Every Spark expression mirrors 1:1 to the DuckDB oracle (same normalize →
same tokens → same arithmetic); divisions happen on identical operands so
doubles match bitwise.  NB DuckDB ``regexp_replace`` needs the explicit
``'g'`` flag — without it only the first whitespace run collapses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    LANG_PRIORITY,
    avg_token_length,
    tokens,
    lang_id,
    md5_fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_token_count,
)
from ..sources import load_table
from .registry import query

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


@query(
    "text_stats",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT
      doc_id,
      len(toks)                                    AS n_tokens,
      len(list_distinct(toks))                     AS n_uniq_tokens,
      CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
        / nullif(CAST(len(toks) AS DOUBLE), 0.0)   AS avg_token_len,
      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                                                   AS n_word_tokens,
      CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / nullif(CAST(length(text) AS DOUBLE), 0.0) AS punct_ratio
    FROM base
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and character stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tokens("text"))).cast("bigint").alias("n_uniq_tokens"),
        avg_token_length("text").alias("avg_token_len"),
        word_token_count("text").alias("n_word_tokens"),
        punct_ratio("text").alias("punct_ratio"),
    )


_SW = ", ".join(f"'{w}'" for w in
                ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
                 "was", "on", "as", "with", "be", "at", "by"))


@query(
    "text_quality",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    feats AS (
      SELECT doc_id,
        CAST(len(toks) AS DOUBLE) AS n,
        CAST(len(list_filter(toks, t -> list_contains([{_SW}], t))) AS DOUBLE)
          / nullif(CAST(len(toks) AS DOUBLE), 0.0) AS sw_ratio,
        CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
          / nullif(CAST(length(text) AS DOUBLE), 0.0) AS p_ratio
      FROM base
    )
    SELECT doc_id,
      round(sw_ratio, 6) AS stopword_ratio,
      round((least(n / 100.0, 1.0)
             + least(sw_ratio * 5.0, 1.0)
             + greatest(0.0, 1.0 - p_ratio * 4.0)) / 3.0, 6) AS quality
    FROM feats
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score for training-data filtering."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


def _lang_oracle() -> str:
    score = {}
    for lang in LANG_PRIORITY:
        if lang == "zh":
            # substring occurrence counts (unsegmented text; 1-char markers)
            terms = " + ".join(
                f"(length(norm) - length(replace(norm, '{m}', '')))"
                for m in LANG_MARKERS[lang]
            )
            score[lang] = f"({terms})"
        else:
            score[lang] = (
                "len(list_filter(toks, t -> list_contains(["
                + ", ".join(repr(w) for w in LANG_MARKERS[lang])
                + "], t)))"
            )
    whens = []
    for lang in LANG_PRIORITY:
        conds = " AND ".join(
            f"s_{lang} >= s_{o}" for o in LANG_PRIORITY if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    scores_sql = ",\n        ".join(f"{v} AS s_{k}" for k, v in score.items())
    zero = " AND ".join(f"s_{lang} = 0" for lang in LANG_PRIORITY)
    return f"""
    WITH base AS (SELECT doc_id, lang, {_NORM} AS norm, {_TOKS} AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
        {scores_sql}
      FROM base
    )
    SELECT doc_id, lang,
      CASE WHEN {zero} THEN 'und'
           {' '.join(whens)}
           ELSE 'und' END AS lang_pred
    FROM scored
    """


@query("text_langid", oracle=_lang_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (n-gram heuristic family): argmax of
    per-language marker hits, priority order on ties.

    Plan: the scalar ``lang_id`` expression evaluates an INTERPRETED
    ``filter`` HOF per language, and every CASE-chain reference
    re-evaluates it (no CSE outside codegen) — ~40 interpreted array
    scans per row, measured 9.5 s at sf1.  Here the latin-language
    token-match counts come from ONE tokens explode → broadcast join
    against the 40-row marker table → per-doc pivot counts (all
    codegen, one doc-keyed partial-agg shuffle ≈ 2.5 s); the zh
    substring score stays a map-side length expression.  The argmax
    CASE then reads plain aggregated columns.  Scores and tie rules are
    IDENTICAL to ``lang_id`` (same markers, same priority) — the
    scalar form remains the per-row reference for expression callers."""
    docs = load_table(spark, sf_dir, "documents")
    marker_rows = [
        (lang, w)
        for lang in LANG_PRIORITY
        if lang != "zh"
        for w in LANG_MARKERS[lang]
    ]
    # LocalRelation (r14, functions/localrel.py): job-free broadcast of
    # the 40-row marker table — the list form parallelized it as an RDD
    from ..functions.localrel import local_frame

    markers = local_frame(spark, marker_rows, "ml string, w string")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    counts = (
        tok.join(F.broadcast(markers), "w")
        .groupBy("doc_id")
        .pivot("ml", [lang for lang in LANG_PRIORITY if lang != "zh"])
        .agg(F.count(F.lit(1)))
    )
    from ..functions.text import normalize_text

    norm = normalize_text("text")
    zh = None
    for m in LANG_MARKERS["zh"]:
        cnt = F.length(norm) - F.length(F.replace(norm, F.lit(m), F.lit("")))
        zh = cnt if zh is None else zh + cnt
    base = docs.select("doc_id", "lang", zh.alias("s_zh"))
    scored = base.join(counts, "doc_id", "left")
    s = {
        lang: F.coalesce(F.col(lang), F.lit(0)).cast("long")
        for lang in LANG_PRIORITY
        if lang != "zh"
    }
    s["zh"] = F.col("s_zh").cast("long")
    all_zero = None
    for lang in LANG_PRIORITY:
        z = s[lang] == 0
        all_zero = z if all_zero is None else (all_zero & z)
    result = None
    for lang in reversed(LANG_PRIORITY):
        cond = None
        for o in LANG_PRIORITY:
            if o == lang:
                continue
            c = s[lang] >= s[o]
            cond = c if cond is None else (cond & c)
        result = (
            F.when(cond, lang)
            if result is None
            else F.when(cond, lang).otherwise(result)
        )
    pred = F.when(all_zero, "und").otherwise(F.coalesce(result, F.lit("und")))
    return scored.select("doc_id", "lang", pred.alias("lang_pred"))


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORM}) AS fp,
           substring(md5({_NORM}), 1, 8) AS fp_prefix
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) — the exact-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    fp = md5_fingerprint("text")
    return docs.select(
        "doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp_prefix")
    )


@query(
    "text_gopher_quality",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    words AS (
      SELECT doc_id, unnest(toks) AS w FROM base
    ),
    wc AS (
      SELECT doc_id, w, COUNT(*) AS n FROM words GROUP BY doc_id, w
    ),
    wstats AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT)               AS n_words,
             CAST(MAX(n) AS BIGINT)               AS top_word_n,
             CAST(SUM(n * length(w)) AS BIGINT)   AS n_chars_in_words,
             CAST(SUM(CASE WHEN regexp_matches(w, '[a-z]') THEN n ELSE 0 END) AS BIGINT)
                                                  AS n_alpha_words
      FROM wc GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id, unnest(
               list_transform(generate_series(1, len(toks) - 1),
                              i -> concat_ws(' ', toks[i], toks[i+1]))) AS bg
      FROM base WHERE len(toks) >= 2
    ),
    bgc AS (
      SELECT doc_id, bg, COUNT(*) AS n FROM bigrams GROUP BY doc_id, bg
    ),
    bgstats AS (
      SELECT doc_id, CAST(MAX(n) AS BIGINT) AS top_bigram_n,
             CAST(SUM(n) AS BIGINT) AS n_bigrams
      FROM bgc GROUP BY doc_id
    )
    SELECT w.doc_id,
           w.n_words,
           CAST(w.n_chars_in_words AS DOUBLE) / w.n_words       AS mean_word_len,
           CAST(w.n_alpha_words AS DOUBLE) / w.n_words          AS alpha_word_frac,
           CAST(w.top_word_n AS DOUBLE) / w.n_words             AS top_word_frac,
           CAST(COALESCE(b.top_bigram_n, 0) AS DOUBLE)
             / COALESCE(b.n_bigrams, 1)                         AS top_bigram_frac,
           (w.n_words BETWEEN 50 AND 100000
            AND (CAST(w.n_chars_in_words AS DOUBLE) / w.n_words) BETWEEN 3.0 AND 10.0
            AND CAST(w.n_alpha_words AS DOUBLE) / w.n_words > 0.8
            AND CAST(w.top_word_n AS DOUBLE) / w.n_words < 0.2
            AND CAST(COALESCE(b.top_bigram_n, 0) AS DOUBLE)
                / COALESCE(b.n_bigrams, 1) < 0.2)               AS gopher_keep
    FROM wstats w LEFT JOIN bgstats b ON w.doc_id = b.doc_id
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality filters (the canonical web-scale
    training-data gate: word count, mean word length, alphabetic-word
    fraction, most-common-word fraction, most-common-bigram fraction, and
    the combined keep decision).

    Plan shape: explode → (doc, token) partial-agg → doc agg — two
    key-shuffles of token-count rows, no UDF anywhere; ratios divide the
    identical integer operands in both engines (bitwise-equal doubles).
    At 100 TB the (doc_id, token) aggregation is the canonical map-side
    combinable shuffle; the bigram pass reuses the same normalized token
    arrays.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    base = docs.select("doc_id", toks.alias("toks"))

    words = base.select("doc_id", F.explode("toks").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    wstats = wc.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_words"),
        F.max("n").cast("bigint").alias("top_word_n"),
        F.sum(F.col("n") * F.length("w")).cast("bigint").alias("n_chars_in_words"),
        F.sum(
            F.when(F.col("w").rlike("[a-z]"), F.col("n")).otherwise(F.lit(0))
        ).cast("bigint").alias("n_alpha_words"),
    )

    bigrams = (
        base.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
                    ),
                )
            ).alias("bg"),
        )
    )
    bgc = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("n"))
    bgstats = bgc.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("top_bigram_n"),
        F.sum("n").cast("bigint").alias("n_bigrams"),
    )

    n_words_d = F.col("n_words").cast("double")
    mean_wl = F.col("n_chars_in_words").cast("double") / n_words_d
    alpha_frac = F.col("n_alpha_words").cast("double") / n_words_d
    top_w_frac = F.col("top_word_n").cast("double") / n_words_d
    top_bg_frac = F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast(
        "double"
    ) / F.coalesce(F.col("n_bigrams"), F.lit(1)).cast("double")

    return wstats.join(bgstats, "doc_id", "left").select(
        "doc_id",
        "n_words",
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        top_w_frac.alias("top_word_frac"),
        top_bg_frac.alias("top_bigram_frac"),
        (
            F.col("n_words").between(50, 100000)
            & mean_wl.between(3.0, 10.0)
            & (alpha_frac > 0.8)
            & (top_w_frac < 0.2)
            & (top_bg_frac < 0.2)
        ).alias("gopher_keep"),
    )


@query(
    "docs_source_mix",
    oracle=f"""
    WITH base AS (
      SELECT source, lang, {_TOKS} AS toks, n_chars FROM documents
    ),
    per AS (
      SELECT source, lang,
             COUNT(*)                      AS n_docs,
             CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT)   AS n_chars
      FROM base GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS all_tokens FROM per)
    SELECT source, lang, n_docs, n_tokens, n_chars,
           CAST(n_tokens AS DOUBLE) / all_tokens AS token_share
    FROM per, tot
    """,
)
def docs_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture accounting per (source, lang): doc/token/char counts
    and each cell's share of all tokens — the bookkeeping behind data-mix
    weighting in a training pipeline.

    Shape: one map-side-combinable groupBy; the global token total joins
    back as a broadcast scalar (crossJoin of a 1-row aggregate), so the
    share division never re-shuffles the grouped rows."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select(
            "source",
            "lang",
            # NULL text must stay NULL (DuckDB len(NULL) is skipped by
            # SUM; Spark's legacy size(NULL) would inject -1)
            F.when(F.col("text").isNotNull(), F.size(tokens("text"))).alias("ntok"),
            "n_chars",
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("all_tokens"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        (F.col("n_tokens").cast("double") / F.col("all_tokens")).alias("token_share"),
    )


@query(
    "text_contamination_flags",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 8
             THEN list_distinct(list_transform(generate_series(0, len(toks)-8),
                    i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
                                        toks[i+5], toks[i+6], toks[i+7], toks[i+8])))
             ELSE [] END) AS g
      FROM base
    ),
    eval_sh AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
    hits AS (
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN eval_sh e ON s.g = e.g
      WHERE s.doc_id >= 10
      GROUP BY s.doc_id
    )
    SELECT b.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated_grams,
           COALESCE(h.n_hits, 0) > 0             AS is_contaminated
    FROM (SELECT doc_id FROM base WHERE doc_id >= 10) b
    LEFT JOIN hits h ON b.doc_id = h.doc_id
    """,
)
def text_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screening: flag corpus docs sharing any
    8-gram with the eval set (docs 0-9 standing in for a benchmark).

    Scale shape: the eval set is tiny by construction, so its distinct
    8-gram set is BROADCAST — corpus shingles stream map-side against it,
    no corpus shuffle for the join; only the per-doc hit count aggregates.
    This is the standard decontamination pass over a 100 TB corpus (the
    eval suite is KBs of n-grams)."""
    from ..functions.text import word_kgrams_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    grams = base.select(
        "doc_id",
        F.explode(word_kgrams_from_tokens(F.col("toks"), 8)).alias("g"),
    )
    eval_grams = grams.filter(F.col("doc_id") < 10).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") >= 10)
    hits = (
        corpus.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        base.filter(F.col("doc_id") >= 10)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_contaminated_grams"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


@query(
    "text_quality_linear_score",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM base),
    w AS (
      SELECT doc_id,
             (CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 1000
                   AS DOUBLE) / 999.0) - 0.5 AS w
      FROM tok
    )
    SELECT doc_id,
           round(avg(w), 6) AS score,
           CASE WHEN avg(w) >= 0.0 THEN 'keep' ELSE 'drop' END AS verdict
    FROM w GROUP BY doc_id
    """,
)
def text_quality_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring at corpus scale — the fasttext-
    style 'hash every token to a learned weight, average, threshold'
    shape (weights here are a DETERMINISTIC md5-derived stand-in so both
    engines compute bit-identical scores; swapping in real learned
    weights changes one expression, not the plan).

    Scale: pure map-side explode + partial-agg'd per-doc mean — no
    shuffle beyond the doc-keyed aggregation, no Python, no model
    broadcast (the 'model' is a hash expression; a real weight table
    ≤ vocab size would broadcast-join the same plan)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    w = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % 1000
    ).cast("double") / 999.0 - 0.5
    return (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("w"), 6).alias("score"),
            F.when(F.avg("w") >= 0.0, "keep").otherwise("drop").alias("verdict"),
        )
    )
