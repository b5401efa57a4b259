"""Text analysis columns (SURVEY.md §2.H): tokenization, quality scoring,
language-ID heuristic, fingerprinting.

The Dask equivalent would be pandas ``.str`` / ``.apply`` per partition
[Dask public API]; here every function is a JVM expression (split /
regexp / higher-order array functions), so a 100 TB documents scan never
crosses the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword lang-ID heuristic.
# Priority order breaks score ties deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "im", "ist"),
    "zh": ("的", "了", "是", "我", "在", "他", "有", "这", "不", "人"),
}
LANG_PRIORITY = ("en", "es", "fr", "de", "zh")

EN_STOPWORDS = LANG_MARKERS["en"] + ("was", "on", "as", "with", "be", "at", "by")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """Canonical form for hashing/dedup: lowercase, trim, collapse
    whitespace runs."""
    return F.regexp_replace(F.trim(F.lower(_col(c))), r"\s+", " ")


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text (ArrayType(String))."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c)).cast("bigint")


def word_token_count(c: Column | str) -> Column:
    """BPE-ish token count: word pieces + digit runs + single punctuation
    (regex approximation of a subword tokenizer's unit count)."""
    return F.size(
        F.regexp_extract_all(_col(c), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("bigint")


def avg_token_length(c: Column | str) -> Column:
    t = tokens(c)
    total = F.aggregate(
        F.transform(t, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.nullif(F.size(t).cast("double"), F.lit(0.0))


def punct_ratio(c: Column | str) -> Column:
    """Non-alphanumeric, non-space chars / total chars."""
    s = _col(c)
    n_punct = F.length(s) - F.length(F.regexp_replace(s, r"[^A-Za-z0-9\s]", ""))
    return n_punct.cast("double") / F.nullif(F.length(s).cast("double"), F.lit(0.0))


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    t = tokens(c)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))
    return n_sw.cast("double") / F.nullif(F.size(t).cast("double"), F.lit(0.0))


def quality_score(c: Column | str) -> Column:
    """Composite [0,1] quality heuristic for training-data filtering:
    rewards mid-length docs, some stopwords, low punctuation noise.
    Deterministic closed form — identical in the SQL oracle."""
    n = token_count(c).cast("double")
    len_score = F.least(n / 100.0, F.lit(1.0))  # saturates at 100 tokens
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 5.0, F.lit(1.0))  # saturates at 20% stopwords
    p = punct_ratio(c)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - p * 4.0)
    return F.round((len_score + sw_score + punct_score) / 3.0, 6)


def lang_scores(c: Column | str) -> dict[str, Column]:
    """Marker-stopword hit count per language.

    Latin languages: whole-token matches.  Chinese: substring occurrence
    counts on the normalized text — zh is unsegmented, so a marker like
    '的' never equals a whitespace token (single-char markers make the
    count just a length difference)."""
    t = tokens(c)
    norm = normalize_text(c)
    out = {}
    for lang in LANG_PRIORITY:
        if lang == "zh":
            score = None
            for m in LANG_MARKERS[lang]:
                cnt = F.length(norm) - F.length(F.replace(norm, F.lit(m), F.lit("")))
                score = cnt if score is None else score + cnt
            out[lang] = score
        else:
            markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
            out[lang] = F.size(F.filter(t, lambda w: F.array_contains(markers, w)))
    return out


def lang_id(c: Column | str) -> Column:
    """argmax of marker scores: the first language in LANG_PRIORITY order
    whose score is >= every other score (so ties resolve by priority);
    'und' when no marker hits at all.  Mirrors 1:1 to a SQL CASE chain."""
    scores = lang_scores(c)
    all_zero = None
    for lang in LANG_PRIORITY:
        z = scores[lang] == 0
        all_zero = z if all_zero is None else (all_zero & z)
    result = None
    for lang in LANG_PRIORITY:
        cond = None
        for o in LANG_PRIORITY:
            if o == lang:
                continue
            ge = scores[lang] >= scores[o]
            cond = ge if cond is None else (cond & ge)
        result = F.when(cond, F.lit(lang)) if result is None else result.when(cond, F.lit(lang))
    return F.when(all_zero, F.lit("und")).otherwise(result.otherwise(F.lit("und")))


def md5_fingerprint(c: Column | str) -> Column:
    """Content fingerprint of the normalized text (md5 — identical
    function exists in DuckDB, so exact-dedup stays oracle-checkable)."""
    return F.md5(normalize_text(c))


def char_shingles(c: Column | str, k: int = 5) -> Column:
    """Character k-shingles of the normalized text (1-based substring)."""
    s = normalize_text(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (k - 1), F.lit(1))),
        lambda i: s.substr(i, F.lit(k)),
    )


def chunk_token_windows(t: Column, chunk: int = 50, stride: int = 25) -> Column:
    """Overlapping token windows for context-length chunking (array of
    chunk texts).  ``stride < chunk`` gives overlap; the last window is
    truncated, and a short doc yields exactly one window.

    Pure JVM: sequence of starts → slice → concat_ws.  Like shingling,
    call on a MATERIALIZED token column (see word_shingles_from_tokens).
    """
    n = F.size(t)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk)).cast("double") / F.lit(stride)).cast("int") + 1,
        F.lit(1),
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        starts,
        lambda i: F.concat_ws(" ", F.slice(t, (i * stride + 1).cast("int"), chunk)),
    )


def word_shingles_from_tokens(t: Column, norm: Column, k: int = 3) -> Column:
    """Word k-shingles from ALREADY-MATERIALIZED token/normalized columns.

    Prefer this over :func:`word_shingles` in any per-row-heavy pipeline:
    nested lambda references defeat Catalyst subexpression elimination, so
    the single-expression form re-runs the regex+split chain per
    ``element_at`` — measured 3-4× slower at 5k docs.  Materialize
    ``tokens``/``norm`` through a projection first, then call this.
    """
    n = F.size(t)
    idx = F.sequence(F.lit(0), n - k)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array(norm))


def word_kgrams_from_tokens(t: Column, k: int) -> Column:
    """Distinct word k-grams from an ALREADY-MATERIALIZED token column,
    with short docs (< k tokens) yielding an EMPTY array (vs
    :func:`word_shingles_from_tokens`, which falls back to the whole
    normalized text — the dedup-shingle convention).  Used by the
    decontamination pass (a doc shorter than the n-gram cannot contain
    it).  Same CSE rule applies: materialize ``t`` through a projection
    first."""
    n = F.size(t)
    idx = F.sequence(F.lit(0), n - k)
    gr = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(gr)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(c: Column | str, k: int = 3) -> Column:
    """Word k-shingles (k-grams of whitespace tokens), distinct.

    Single-expression convenience form; per-row-heavy pipelines should
    materialize tokens first and call :func:`word_shingles_from_tokens`
    (this simply delegates, so the two can never diverge).
    """
    return word_shingles_from_tokens(tokens(c), normalize_text(c), k)


def word_shingles_exploded(
    df,
    text_col: str,
    id_col: str,
    k: int = 3,
    extra_cols: tuple[str, ...] = (),
    short_fallback: bool = True,
):
    """(id, *extra_cols, shingle) ROWS — the codegen path for shingle
    generation.

    The array-building HOF forms above run interpreted (higher-order
    functions never enter whole-stage codegen) and, worse, Catalyst's
    projection collapsing can in-line the tokenize chain back into every
    ``element_at``: measured 10 s for 260k shingles at sf0.1 vs 1.9 s for
    this form.  Here tokens are POSEXPLODED once and each k-gram is a
    ``concat_ws`` over ``lead()`` window frames — every expression
    codegen-friendly; the one exchange (by ``id_col``) replaces
    per-element interpreted evaluation and is the same width the caller's
    next aggregation would shuffle anyway.

    Semantics match ``word_shingles_from_tokens`` + the SQL oracles'
    CASE fallback: docs with ≥ k tokens emit their k-grams (NOT
    de-duplicated within doc — apply ``distinct()`` downstream if set
    semantics are needed); shorter docs emit their whole normalized text
    as the single shingle."""
    from pyspark.sql import Window

    t = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        *extra_cols,
        t.alias("__t"),
        normalize_text(text_col).alias("__norm"),
    )
    long_docs = base.filter(F.size("__t") >= k)
    tk = long_docs.select(
        "id", *extra_cols, F.posexplode("__t").alias("__pos", "__tok")
    )
    w = Window.partitionBy("id").orderBy("__pos")
    leads = [F.col("__tok")] + [F.lead("__tok", j).over(w) for j in range(1, k)]
    grams = (
        tk.select(
            "id",
            *extra_cols,
            F.concat_ws(" ", *leads).alias("shingle"),
            leads[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .drop("__last")
    )
    if not short_fallback:
        # kgram convention (word_kgrams_from_tokens): a doc shorter than
        # the gram emits nothing
        return grams
    short = base.filter(F.size("__t") < k).select(
        "id", *extra_cols, F.col("__norm").alias("shingle")
    )
    return grams.unionByName(short)
