"""``delayed`` — the reference's imperative task idiom, executed on Spark.

The reference's only demonstrated user workloads are single delayed
calls (``dask.delayed(sum)(range(1000)).compute()`` at
``/root/reference/example/test.py:23`` and
``dask.delayed(my_library.func)(range(100)).compute()`` at
``/root/reference/example/custom_image/test.py:7``).  This module gives
a migrating user that exact idiom — ``delayed(fn)(*args).compute()``,
including nested ``Delayed`` arguments and containers of them — while
running every task in Spark's Python workers, not the driver:

- the task DAG is walked in dependency layers;
- each layer's ready tasks execute as ONE Spark job
  (``sc.parallelize(payloads, len(layer)).map(run)``) — independent
  tasks run in parallel across executor cores exactly as dask's
  scheduler would run graph siblings;
- results come back to the driver and feed downstream tasks.

Deliberate scope (PARITY.md §2.A): this is a *migration on-ramp* for the
reference's demonstrated pattern, not a general graph scheduler — big
data belongs in DataFrames where Catalyst can see it.  Payloads and
results ride Spark's pickle serializer, so they must be picklable and
driver-memory-sized; a ``delayed``-heavy analytics script should become
DataFrame code, and every reference query surface has one here.

Determinism/caching: a ``Delayed`` node computes at most once per
``compute()`` call (diamond dependencies share the single result), and
repeated ``.compute()`` calls re-execute — matching ``dask.delayed``
with ``pure=False`` defaults.
"""

from __future__ import annotations

import itertools
import uuid
from typing import Any, Callable

from pyspark.sql import SparkSession

_KEYS = itertools.count()


class Delayed:
    """A lazily-evaluated task node: ``fn(*args, **kwargs)`` whose
    arguments may themselves be (containers of) ``Delayed`` nodes."""

    __slots__ = ("fn", "args", "kwargs", "key")

    def __init__(self, fn: Callable, args: tuple, kwargs: dict):
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        name = getattr(fn, "__name__", "task")
        self.key = f"{name}-{next(_KEYS)}-{uuid.uuid4().hex[:8]}"

    def compute(self, spark: SparkSession | None = None) -> Any:
        """Execute this node's dependency graph on Spark and return its
        value (the reference smoke contract: ``delayed(sum)(range(1000))
        .compute() == 499500``)."""
        return compute(self, spark=spark)[0]

    def __repr__(self) -> str:  # pragma: no cover
        return f"Delayed({self.key})"


def delayed(fn: Callable) -> Callable[..., Delayed]:
    """``delayed(fn)(*args, **kwargs) -> Delayed`` — the ``dask.delayed``
    call shape for plain callables.  Passing an already-``Delayed`` value
    as an argument chains tasks."""
    if isinstance(fn, Delayed):
        raise TypeError(
            "delayed(...) wraps a callable; to defer a call on a Delayed "
            "result, wrap the downstream function instead"
        )
    if not callable(fn):
        raise TypeError(f"delayed() needs a callable, got {type(fn).__name__}")

    def _make(*args: Any, **kwargs: Any) -> Delayed:
        return Delayed(fn, args, kwargs)

    _make.__name__ = f"delayed_{getattr(fn, '__name__', 'task')}"
    return _make


def _walk_deps(obj: Any):
    """Yield Delayed nodes nested in an argument value (lists/tuples/
    sets/dicts traversed one level at a time, like dask's traversal)."""
    if isinstance(obj, Delayed):
        yield obj
    elif isinstance(obj, (list, tuple, set)):
        for v in obj:
            yield from _walk_deps(v)
    elif isinstance(obj, dict):
        for v in obj.values():
            yield from _walk_deps(v)


class ScatterRef:
    """A cluster-resident value: ``Client.scatter`` wraps the data in a
    Spark broadcast (shipped to each executor ONCE, torrent-style) and
    hands back this reference to use as a task argument.  Payload
    substitution swaps it for a marker resolved worker-side from the
    broadcast, so the data never rides per-task payloads."""

    __slots__ = ("bc", "rid")

    def __init__(self, bc):
        self.bc = bc
        self.rid = next(_KEYS)  # module-unique marker id

    def __repr__(self) -> str:  # pragma: no cover
        return f"ScatterRef({self.rid})"


# Worker-side placeholder for a scattered value: a Broadcast cannot be
# pickled as RDD *data* (only closures may carry it), so payloads hold a
# plain marker dict under this reserved key and the task closure resolves
# it against the broadcast map it captured.  A plain dict keeps the
# worker free of any import of this module.
_BC_KEY = "__dask_ssh_docker_spark_scatter__"


def _substitute(obj: Any, done: dict[str, Any], bcs: dict[int, Any]) -> Any:
    if isinstance(obj, Delayed):
        return done[obj.key]
    if isinstance(obj, ScatterRef):
        bcs[obj.rid] = obj.bc
        return {_BC_KEY: obj.rid}
    if isinstance(obj, list):
        return [_substitute(v, done, bcs) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_substitute(v, done, bcs) for v in obj)
    if isinstance(obj, set):
        # the dict marker is unhashable, so inside sets a ScatterRef
        # substitutes to the hashable tuple form instead (resolved by
        # the same worker-side marker check)
        out = set()
        for v in obj:
            if isinstance(v, ScatterRef):
                bcs[v.rid] = v.bc
                out.add((_BC_KEY, v.rid))
            else:
                out.add(_substitute(v, done, bcs))
        return out
    if isinstance(obj, dict):
        return {k: _substitute(v, done, bcs) for k, v in obj.items()}
    return obj


def compute(
    *outputs: Delayed,
    spark: SparkSession | None = None,
    _precomputed: dict[str, Any] | None = None,
) -> tuple:
    """Evaluate one or more ``Delayed`` graphs; returns their values in
    order.  Tasks with satisfied dependencies run together as one Spark
    job per dependency layer, one task per partition, on executor Python
    workers (tests pin worker-side execution via pid).

    ``_precomputed``: results keyed by node key that are already known
    (the futures layer's run-once cache) — such nodes and their whole
    upstream subgraphs are skipped, matching ``distributed``'s
    task-runs-once semantics for chained futures."""
    for o in outputs:
        if not isinstance(o, Delayed):
            raise TypeError(f"compute() takes Delayed inputs, got {type(o).__name__}")
    done = _compute_graph(outputs, spark, _precomputed)
    return tuple(done[o.key] for o in outputs)


def _compute_graph(
    outputs: tuple,
    spark: SparkSession | None,
    _precomputed: dict[str, Any] | None,
) -> dict[str, Any]:
    """Graph evaluation core; returns the FULL results map (every node
    computed this call plus the precomputed entries) so callers like the
    futures layer can complete dependency futures too."""
    if spark is None:
        from .session import get_session

        spark = get_session()
    sc = spark.sparkContext

    done: dict[str, Any] = dict(_precomputed or {})

    # collect all nodes reachable from the outputs, stopping at known ones
    nodes: dict[str, Delayed] = {}
    stack = list(outputs)
    while stack:
        d = stack.pop()
        if d.key in nodes or d.key in done:
            continue
        nodes[d.key] = d
        stack.extend(_walk_deps(d.args))
        stack.extend(_walk_deps(d.kwargs))

    deps = {
        k: {p.key for p in (*_walk_deps(d.args), *_walk_deps(d.kwargs))}
        for k, d in nodes.items()
    }

    pending = set(nodes)
    while pending:
        ready = [k for k in pending if deps[k] <= done.keys()]
        if not ready:  # cycle: impossible via the public API, but be loud
            raise ValueError(f"delayed graph has a cycle among: {sorted(pending)}")
        ready.sort()  # deterministic partition order
        # cloudpickle the payloads ourselves: RDD *data* rides the plain
        # pickler, which can't carry lambdas/closures/test-local functions
        # — cloudpickle serializes any callable by value, exactly like
        # dask ships tasks to workers
        from pyspark import cloudpickle

        bcs: dict[int, Any] = {}  # broadcasts used by this layer's tasks
        payloads = [
            cloudpickle.dumps(
                (
                    nodes[k].fn,
                    _substitute(list(nodes[k].args), done, bcs),
                    _substitute(nodes[k].kwargs, done, bcs),
                )
            )
            for k in ready
        ]
        bmap = bcs  # captured by the closure serializer, which CAN carry
        # Broadcast handles (payload data cannot); workers resolve markers
        # against it and read each value from the local broadcast block
        bc_key = _BC_KEY

        def _exec(blob):  # nested → cloudpickled by value, no module
            import pickle  # import needed on the worker

            def res(o):
                if isinstance(o, dict):
                    if len(o) == 1 and bc_key in o:
                        return bmap[o[bc_key]].value
                    return {k: res(v) for k, v in o.items()}
                if isinstance(o, list):
                    return [res(v) for v in o]
                if isinstance(o, tuple):
                    # hashable scatter marker (set members): (key, rid)
                    if (
                        len(o) == 2
                        and o[0] == bc_key
                        and isinstance(o[1], int)
                        and o[1] in bmap
                    ):
                        return bmap[o[1]].value
                    return tuple(res(v) for v in o)
                if isinstance(o, set):
                    return {res(v) for v in o}
                return o

            fn, args, kwargs = pickle.loads(blob)
            return fn(*res(args), **res(kwargs))

        results = sc.parallelize(payloads, len(payloads)).map(_exec).collect()
        done.update(zip(ready, results))
        pending.difference_update(ready)

    return done
