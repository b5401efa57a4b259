#!/usr/bin/env python
"""Count py4j driver round-trips per query CONSTRUCTION (r13 §8's
noise-free metric, committed as a tool in r14 per VERDICT item 4): each
Column/DataFrame API call costs java-gateway ``send_command`` round-trips;
loops that build thousands of Columns show up here long before they show
up in (noisy) walls.  Construction only — the frame is built, never
executed.

Usage:
    python tools/py4j_roundtrips.py [query ...]     # default: bench HEADLINE
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    names = sys.argv[1:] or HEADLINE
    unknown = [q for q in names if q not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    spark = get_session("spark-graft-py4j")

    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    counter = {"n": 0}

    def _wrap(cls):
        orig = cls.send_command

        def counted(self, *a, **kw):
            counter["n"] += 1
            return orig(self, *a, **kw)

        cls.send_command = counted

    # PySpark uses ClientServer (pinned-thread) by default; patch both.
    _wrap(jg.GatewayClient)
    _wrap(cs.JavaClient)

    for name in names:
        # warm construction once (schema caches, module init) so the
        # counted pass measures the steady per-run construction cost the
        # bench re-pays every run
        REGISTRY[name].fn(spark, sf_dir)
        counter["n"] = 0
        REGISTRY[name].fn(spark, sf_dir)
        print(json.dumps({"name": name, "send_commands": counter["n"]}),
              flush=True)


if __name__ == "__main__":
    main()
