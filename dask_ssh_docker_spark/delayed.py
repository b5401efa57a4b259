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


def _substitute(obj: Any, done: dict[str, Any]) -> Any:
    if isinstance(obj, Delayed):
        return done[obj.key]
    if isinstance(obj, list):
        return [_substitute(v, done) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_substitute(v, done) for v in obj)
    if isinstance(obj, set):
        return {_substitute(v, done) for v in obj}
    if isinstance(obj, dict):
        return {k: _substitute(v, done) for k, v in obj.items()}
    return obj


def compute(*outputs: Delayed, spark: SparkSession | None = None) -> tuple:
    """Evaluate one or more ``Delayed`` graphs; returns their values in
    order.  Tasks with satisfied dependencies run together as one Spark
    job per dependency layer, one task per partition, on executor Python
    workers (tests pin worker-side execution via pid)."""
    for o in outputs:
        if not isinstance(o, Delayed):
            raise TypeError(f"compute() takes Delayed inputs, got {type(o).__name__}")
    if spark is None:
        from .session import get_session

        spark = get_session()
    sc = spark.sparkContext

    # collect all nodes reachable from the outputs
    nodes: dict[str, Delayed] = {}
    stack = list(outputs)
    while stack:
        d = stack.pop()
        if d.key in nodes:
            continue
        nodes[d.key] = d
        stack.extend(_walk_deps(d.args))
        stack.extend(_walk_deps(d.kwargs))

    deps = {
        k: {p.key for p in (*_walk_deps(d.args), *_walk_deps(d.kwargs))}
        for k, d in nodes.items()
    }

    done: dict[str, Any] = {}
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

        payloads = [
            cloudpickle.dumps(
                (
                    nodes[k].fn,
                    _substitute(list(nodes[k].args), done),
                    _substitute(nodes[k].kwargs, done),
                )
            )
            for k in ready
        ]

        def _exec(blob):  # nested → cloudpickled by value, no module
            import pickle  # import needed on the worker

            fn, args, kwargs = pickle.loads(blob)
            return fn(*args, **kwargs)

        results = sc.parallelize(payloads, len(payloads)).map(_exec).collect()
        done.update(zip(ready, results))
        pending.difference_update(ready)

    return tuple(done[o.key] for o in outputs)
