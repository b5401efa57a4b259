#!/usr/bin/env python
"""Doc-count drift guard (VERDICT r7 item 8).

PARITY.md's headline totals went stale twice (r5: 218 vs actual 230).
This asserts the documented totals equal the live registry so the docs
can't drift again: PARITY.md must contain the literal string
``**{N} registered queries — {O} oracle-matched, {R} rows-only**`` where
N/O/R come from ``len(REGISTRY)`` and the oracle split.
"""

from __future__ import annotations

import os
import re
import sys


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from dask_ssh_docker_spark.queries import REGISTRY

    total = len(REGISTRY)
    oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    rows_only = total - oracle

    with open(os.path.join(root, "PARITY.md")) as fh:
        text = fh.read()
    m = re.search(
        r"\*\*(\d+) registered queries — (\d+) oracle-matched, "
        r"(\d+) rows-only\*\*",
        text,
    )
    if not m:
        print("FAIL: PARITY.md is missing the totals line")
        return 1
    doc = tuple(int(g) for g in m.groups())
    live = (total, oracle, rows_only)
    if doc != live:
        print(f"FAIL: PARITY.md says {doc}, registry is {live} — update PARITY.md")
        return 1
    print(f"OK: PARITY.md totals match registry {live}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
