#!/usr/bin/env python
"""Doc-count drift guard (VERDICT r7 item 8; window census r12 per
VERDICT r11 item 7).

PARITY.md's headline totals went stale twice (r5: 218 vs actual 230).
This asserts the documented totals equal the live registry so the docs
can't drift again: PARITY.md must contain the literal string
``**{N} registered queries — {O} oracle-matched, {R} rows-only**`` where
N/O/R come from ``len(REGISTRY)`` and the oracle split.

SCALE.md's window-partition census is checked the same way: its count
was hand-maintained and drifted (69 documented vs 68-71 by grep
depending on convention — VERDICT r11 residual 4).  The convention is
now pinned to ONE machine-checkable number: total OCCURRENCES of the
string ``Window.partitionBy`` across ``dask_ssh_docker_spark/**/*.py``
(a line with two calls counts twice).  SCALE.md must say ``All {N}
partitioned-window call sites`` with that exact N.
"""

from __future__ import annotations

import os
import re
import sys


def _window_site_count(root: str) -> int:
    pkg = os.path.join(root, "dask_ssh_docker_spark")
    n = 0
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                with open(os.path.join(dirpath, fn)) as fh:
                    n += fh.read().count("Window.partitionBy")
    return n


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

    with open(os.path.join(root, "SCALE.md")) as fh:
        scale = fh.read()
    mw = re.search(r"All (\d+) partitioned-window call sites", scale)
    if not mw:
        print("FAIL: SCALE.md is missing the window-census count line")
        return 1
    live_w = _window_site_count(root)
    if int(mw.group(1)) != live_w:
        print(
            f"FAIL: SCALE.md census says {mw.group(1)} window sites, grep "
            f"convention (occurrences of Window.partitionBy in the "
            f"package) counts {live_w} — update the census"
        )
        return 1
    print(f"OK: SCALE.md window census matches the tree ({live_w} occurrences)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
