"""Physical-plan introspection & assertions (SURVEY.md §4).

The scale story of every operator is checkable, not aspirational: these
helpers read the executed plan and assert the properties that matter at
100 TB — filters reaching the parquet scan, projections pruning columns,
small dimensions broadcast, shuffle counts bounded, expressions inside
WholeStageCodegen.  Used by tests/test_plans.py and available to users for
their own pipelines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # pragma: no cover
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle boundaries in the plan (AQE reuse excluded)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the parquet scan's PushedFilters mention every fragment."""
    plan = physical_plan(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = " ".join(m)
    return all(f in pushed for f in fragments)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Output column lists of each file scan (column-pruning check).
    Parsed from the ``FileScan`` bracket list (``ReadSchema`` truncates
    in plan strings)."""
    plan = physical_plan(df)
    out = []
    for m in re.findall(r"FileScan \w+ \[([^\]]*)\]", plan):
        cols = [re.sub(r"#\d+L?$", "", c.strip()) for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def _iter_plan_nodes(node):
    """Depth-first walk of a JVM LogicalPlan tree via py4j."""
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _iter_plan_nodes(children.apply(i))


def _broadcast_hint_nodes(df: DataFrame):
    """JVM ``ResolvedHint`` nodes with a broadcast strategy, found by
    walking the analyzed logical plan tree (not regex over the flattened
    string — a hinted subtree whose leaf is a LogicalRDD or view would be
    mis-attributed to the next relation in the string)."""
    plan = df._jdf.queryExecution().analyzed()
    for node in _iter_plan_nodes(plan):
        if node.getClass().getSimpleName() == "ResolvedHint":
            if "broadcast" in node.hints().toString().lower():
                yield node


def hinted_broadcast_tables(df: DataFrame) -> set[str]:
    """First output column of each leaf relation sitting under a
    ``ResolvedHint (strategy=broadcast)`` node in the *analyzed* logical
    plan.  This identifies tables carrying a FORCED broadcast hint — as
    opposed to broadcasts chosen by the planner/AQE from size estimates,
    which never appear as hints.  Scale policy: only fixed-cardinality
    dims (region/nation) may show up here; a hint on a scale-growing
    table (customer/supplier/part → first columns ``c_*``/``s_*``/``p_*``)
    is a 100 TB OOM bug."""
    out: set[str] = set()
    for node in _broadcast_hint_nodes(df):
        leaves = node.child().collectLeaves()
        for i in range(leaves.length()):
            cols = leaves.apply(i).output()
            if cols.length() > 0:
                out.add(cols.apply(0).name())
    return out


def hinted_unbounded_aggregate_broadcasts(df: DataFrame) -> list[str]:
    """Forced-broadcast subtrees that contain a *grouped* aggregate —
    i.e. a broadcast whose row count scales with data cardinality (a
    distinct-terms vocabulary, a per-key rollup).  A global aggregate
    (no grouping keys → exactly one row) is bounded and exempt.  Any
    entry returned here is a guaranteed 100 TB executor OOM: a forced
    hint bypasses AQE's size threshold.  Returns the simpleString of
    each offending hint child for assertion messages."""
    def _unbounded_grouped_agg(node) -> bool:
        name = node.getClass().getSimpleName()
        if name == "Aggregate":
            if node.groupingExpressions().length() == 0:
                return False  # global agg: exactly 1 row, prune subtree
            return True
        if name in ("GlobalLimit", "LocalLimit"):
            return False  # limit caps cardinality, prune subtree
        children = node.children()
        return any(
            _unbounded_grouped_agg(children.apply(i))
            for i in range(children.length())
        )

    bad: list[str] = []
    for node in _broadcast_hint_nodes(df):
        if _unbounded_grouped_agg(node.child()):
            bad.append(node.child().nodeName())
    return bad


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of ``Window`` nodes with an EMPTY partition spec in the
    analyzed logical plan — each one executes as a single-partition
    sort of its whole input (the 100 TB straggler/OOM shape that
    ``operators/ranking.py`` exists to eliminate).  0 means every
    ordered window in the plan is keyed."""
    plan = df._jdf.queryExecution().analyzed()
    n = 0
    for node in _iter_plan_nodes(plan):
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().length() == 0:
                n += 1
    return n


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """Top-k executed as TakeOrderedAndProject (no full sort)."""
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider spans = fewer is better
    for the same plan size).  Executes the frame once: under AQE the
    codegen annotations only appear in the finalized plan."""
    df.write.format("noop").mode("overwrite").save()
    return len(set(re.findall(r"\*\((\d+)\)|WholeStageCodegen \((\d+)\)", physical_plan(df))))


def uses_python_eval(df: DataFrame) -> bool:
    """True if the plan crosses into Python row evaluation (BatchEvalPython
    = slow path; ArrowEvalPython/MapInPandas = the sanctioned batch path)."""
    return "BatchEvalPython" in physical_plan(df)
