"""Executor code shipping: register engine modules for BY-VALUE
cloudpickle serialization.

PySpark pickles a module-level function *by reference* (module path +
name), so any worker-side closure that captures one — e.g.
``ivf._assign``'s Arrow pass capturing ``pq._nearest_rows`` — requires
``dask_ssh_docker_spark`` to be importable inside every Python worker
process.  That holds when the driver runs from the repo root (workers
inherit the cwd) but silently breaks for a consumer who only
``sys.path``-inserts the repo on the driver, and on a real cluster it
would demand the package be pre-installed on every executor image.

The reference's answer is baking code into the docker image
(``example/custom_image/Dockerfile:1-2``); the Spark-native answer for a
*library* is to make its shipped closures self-contained:
``cloudpickle.register_pickle_by_value(module)`` embeds the function
bytecode in the task payload instead of a dotted import path.  Payload
cost is a few KB per pickled function — nothing against an Arrow batch.

Every module that ships closures to executors calls
:func:`ship_module_by_value` on itself at import time (idempotent).
Third-party references inside those functions (numpy, pandas, pyspark)
still pickle by reference — they ARE importable on workers.
"""

from __future__ import annotations

import sys
from types import ModuleType


def ship_module_by_value(module: ModuleType | str) -> None:
    """Idempotently register ``module`` (object or ``__name__``) for
    by-value cloudpickle in PySpark task serialization.  Best-effort:
    a missing/old cloudpickle degrades to the by-reference status quo
    (works whenever workers can import the package)."""
    try:
        from pyspark import cloudpickle
    except Exception:  # pragma: no cover - pyspark always vendors it
        return
    if isinstance(module, str):
        module = sys.modules[module]
    try:
        cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - e.g. cloudpickle < 2.0
        pass
