#!/usr/bin/env python
"""Never-checked guard (VERDICT r5 item 2).

The driver's correctness gate records exactly the first 50 registry names
each round.  This guard fails if any registered query would remain without
driver-side evidence after the NEXT driver round, i.e. if a name is

  * absent from the union of all recorded ``CORRECTNESS_r*.json`` keys, AND
  * outside the upcoming 50-name window (the first 50 registry entries).

Run from the repo root (tools/check_all.sh does).  Exit 0 = every registry
entry either already has a driver row or is queued in the next window;
exit 1 otherwise, listing the orphans.  This makes the r4/r5 failure mode
(new queries registered behind a stale window, never sampled) impossible
to reintroduce silently.
"""
from __future__ import annotations

import glob
import json
import os
import sys

WINDOW = 50  # driver samples exactly the first 50 registry names per round


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from dask_ssh_docker_spark.queries import REGISTRY

    checked: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            checked |= set(json.load(fh).keys())

    names = list(REGISTRY)
    upcoming = set(names[:WINDOW])
    never = [n for n in names if n not in checked]
    orphans = [n for n in never if n not in upcoming]

    print(
        f"registry={len(names)} driver-checked={len(checked & set(names))} "
        f"never-checked={len(never)} (queued in next window: "
        f"{len(never) - len(orphans)})"
    )
    if orphans:
        print("FAIL: never driver-checked and NOT in the upcoming 50-name window:")
        for n in orphans:
            print(f"  - {n}")
        print("Fix: move these names into _PRIORITY (queries/__init__.py).")
        return 1
    print("OK: every registry entry has a driver row or is queued next round.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
