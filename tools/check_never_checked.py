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
import re
import sys

WINDOW = 50  # driver samples exactly the first 50 registry names per round
STALE_ROUNDS = 5  # warn when a name's newest driver row is this many rounds old


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from dask_ssh_docker_spark.queries import REGISTRY

    checked: set[str] = set()
    last_round: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        rounds.append(rnd)
        with open(path) as fh:
            keys = set(json.load(fh).keys())
        checked |= keys
        for k in keys:
            last_round[k] = max(last_round.get(k, 0), rnd)

    names = list(REGISTRY)
    upcoming = set(names[:WINDOW])
    never = [n for n in names if n not in checked]
    orphans = [n for n in never if n not in upcoming]

    print(
        f"registry={len(names)} driver-checked={len(checked & set(names))} "
        f"never-checked={len(never)} (queued in next window: "
        f"{len(never) - len(orphans)})"
    )

    # Staleness report (VERDICT r7 item 6): a query last driver-checked
    # more than STALE_ROUNDS ago should rotate back into the window soon;
    # this is a WARNING, not a failure — the window holds 50 of 200+, so
    # some staleness is structural.  Names already queued next round are
    # excluded (they're about to refresh).
    if rounds:
        newest = max(rounds)
        stale = sorted(
            (
                (n, last_round[n])
                for n in names
                if n in last_round
                and newest - last_round[n] >= STALE_ROUNDS
                and n not in upcoming
            ),
            key=lambda t: t[1],
        )
        if stale:
            print(
                f"WARN: {len(stale)} queries last driver-checked ≥"
                f"{STALE_ROUNDS} rounds ago and NOT queued next round "
                f"(oldest first):"
            )
            for n, r in stale[:15]:
                print(f"  - {n} (last r{r})")
            if len(stale) > 15:
                print(f"  ... and {len(stale) - 15} more")
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
