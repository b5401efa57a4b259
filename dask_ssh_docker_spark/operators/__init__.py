"""Custom operators the built-in DataFrame API lacks (SURVEY.md §2.D
merge_asof, §2.H dedup / similarity).

Each operator is a library-level DataFrame rewrite — no custom Catalyst
rules (SURVEY.md §4.2): declarative compositions keep predicate pushdown,
AQE, and whole-stage codegen intact.
"""

from .asof import merge_asof  # noqa: F401
