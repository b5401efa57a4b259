"""Query registry: name -> (Spark callable, optional DuckDB oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL, or None → driver rows-only check
    #: True = O(n²) validation baseline whose INPUT is capped above
    #: ``_util.VALIDATION_MAX_ROWS`` — diverges from its full-table oracle
    #: at sf≥1.  The sweep's [validation-cap] annotation and the oracle
    #: gate's --skip-capped set are DERIVED from this flag (single source
    #: of truth; ADVICE r8).
    validation_capped: bool = False
    #: corpus that sf>=1 sweeps should route this query to instead
    #: of the legacy-vocabulary dir: "zipf" = the realistic 50k-term
    #: corpus.  Rationale (VERDICT r10 item 7): setsim_prefix_pairs is
    #: linear on real text but the legacy 30-word vocabulary defeats
    #: prefix filtering (~n² candidates in BOTH engines at sf10 - a
    #: corpus artifact, BENCH_NOTES r10 §1); routing replaces the
    #: documented skip so the deep sweep covers the operator at scale.
    #: The oracle comparison is corpus-independent (both engines read
    #: the routed parquet).  None = run on the sweep's own dir.
    bench_corpus: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    validation_capped: bool = False,
    bench_corpus: str | None = None,
):
    """Register a query. ``oracle=None`` marks a non-SQL-expressible op
    (approx sketches, ML-backed LSH, streaming) → weaker rows-only check.
    ``validation_capped=True`` marks O(n²) baselines input-capped above
    validation scale (their oracle only matches at sf ≤ 0.1)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, validation_capped, bench_corpus)
        return fn

    return deco


def validation_capped_names() -> set[str]:
    """Names of all registered input-capped validation baselines."""
    return {n for n, s in REGISTRY.items() if s.validation_capped}
