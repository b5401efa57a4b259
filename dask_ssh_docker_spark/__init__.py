"""dask_ssh_docker_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference tool ``wwoods/dask-ssh-docker`` (a Dask cluster launcher; see
SURVEY.md).  The reference exposes the Dask collection API on a deployed
cluster; this package re-expresses that capability surface Spark-first:

- :mod:`.session`    — SparkSession factory (local/cluster transparency,
  mirroring the contract of ``/root/reference/bin/dask-ssh-docker:76-99``).
- :mod:`.runner`     — CLI script runner (``main(argv)`` protocol of
  ``/root/reference/bin/dask-ssh-docker:96-99``).
- :mod:`.delayed`    — the ``dask.delayed`` call idiom executed on Spark
  workers (the reference's demonstrated workloads,
  ``/root/reference/example/test.py:23``).
- :mod:`.sources`    — readers/writers (SURVEY.md §2.B).
- :mod:`.operators`  — relational + custom operators: as-of join, dedup
  (exact/MinHash/SimHash/Jaccard/embedding), similarity search, rolling /
  resample windows, deterministic sampling (SURVEY.md §2.C–§2.I, §2.H).
- :mod:`.functions`  — scalar function surface: text analysis, vector math
  (SURVEY.md §2.G, §2.H).
- :mod:`.streaming`  — Structured Streaming helpers (SURVEY.md §2.H).
- :mod:`.queries`    — the driver-checked query suite + DuckDB oracles.

Everything is built on the public PySpark 4.x DataFrame/SQL API; no code is
copied from the reference.
"""

from .delayed import Delayed, compute, delayed
from .session import get_session, stop_session
from . import functions, operators, plans, sources, streaming  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "stop_session",
    "delayed",
    "compute",
    "Delayed",
    "functions",
    "operators",
    "plans",
    "sources",
    "streaming",
    "__version__",
]
