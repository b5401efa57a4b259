"""Custom operators the built-in DataFrame API lacks (SURVEY.md §2.D
merge_asof, §2.H dedup / similarity).

Each operator is a library-level DataFrame rewrite — no custom Catalyst
rules (SURVEY.md §4.2): declarative compositions keep predicate pushdown,
AQE, and whole-stage codegen intact.
"""

from .asof import merge_asof  # noqa: F401
from .concat import concat_columns, with_row_index  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    exact_dedup_groups,
    jaccard_pairs_exact,
    minhash_dedup,
    simhash_dedup_pairs,
)
from .partitioning import (  # noqa: F401
    bucketed_join,
    salted_join,
    sorted_range_write,
    write_bucketed,
)
from .multimodal import (  # noqa: F401
    decode_image_meta,
    sample_frame_offsets,
    with_blob_metadata,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_neardup_pairs,
    lsh_topk,
)
