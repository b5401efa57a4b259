"""Driver-checked query suite (SURVEY.md §2 inventory → ``queries()``).

Every operator family from SURVEY.md §2 gets at least one registered query
here.  A registered query is a callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) a DuckDB oracle SQL string; the driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value-hash.

Determinism rules used throughout (see ``_util.py``):

- Money/measure aggregates run in exact DECIMAL arithmetic and are cast to
  DOUBLE only at the end — bit-identical across Spark and DuckDB,
  regardless of partition/accumulation order.
- Averages are computed as ``double(sum_decimal) / count`` so both engines
  perform the identical IEEE division.
- Every top-k / limit query breaks ties on a unique key.
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import for registration side effects — each module registers its queries.
from . import relational  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import asof  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import udf_multimodal  # noqa: E402,F401
from . import approx_extra  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import map_funcs  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import agg_by  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import text_rank_binning  # noqa: E402,F401


def spark_queries():
    """dict name -> (spark, sf_dir) -> DataFrame, for ``__spark_entry__``."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_queries():
    """dict name -> DuckDB oracle SQL (only SQL-expressible entries)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
