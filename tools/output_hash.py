#!/usr/bin/env python
"""Order-insensitive output hash per query — the optimization round's
result-invariance check.  Usage:

    python tools/output_hash.py <out.json> <query> [<query> ...]

Writes {name: {"n": rows, "hash": md5-of-sorted-row-reprs}} to out.json.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    spark = get_session("output-hash")
    out = {}
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        rows = sorted(repr(tuple(r)) for r in df.collect())
        h = hashlib.md5("\n".join(rows).encode()).hexdigest()
        out[name] = {"n": len(rows), "hash": h}
        print(name, len(rows), h, flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
