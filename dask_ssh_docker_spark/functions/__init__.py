"""Scalar/column function namespace (SURVEY.md §2.G, §2.H text analysis,
vector math).  Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, inside WholeStageCodegen; no Python
UDFs in any hot path.
"""

from .text import (  # noqa: F401
    avg_token_length,
    char_shingles,
    lang_id,
    md5_fingerprint,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from .scan import cumulative_product  # noqa: F401
from .vector import cosine_similarity, dot, l2_norm  # noqa: F401
