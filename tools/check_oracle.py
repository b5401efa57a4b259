#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every registered query (``dask_ssh_docker_spark.queries``) on Spark and
its DuckDB oracle SQL on the same parquet, then compares row-count + schema
(column names) + order-insensitive value-hash, the way the driver does for
CORRECTNESS_r{N}.json (contract in ``__spark_entry__.py:1-8``).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.01
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if v is None or v != v:  # NaN/None normalize
        return "∅"
    if isinstance(v, float):
        import math

        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0.0:
            return "0.000000"  # fold -0.0 (sign of zero is engine-dependent)
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6g}" if abs(v) > 1e14 else f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if type(v).__name__ == "date":  # datetime.date ≡ midnight timestamp
        return pd.Timestamp(v).isoformat()
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        ",".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--plain"]
    plain = "--plain" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from dask_ssh_docker_spark.queries import REGISTRY

    if plain:
        # driver simulation: a bare session with none of the engine's conf —
        # queries must self-provision any runtime conf they need
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from dask_ssh_docker_spark.session import get_session

        spark = get_session("check-oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    unknown = only - set(REGISTRY)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle, rows-only)")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            hs, ho = frame_hash(sdf), frame_hash(odf)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}  [{dt:.1f}s]")
        else:
            print(f"PASS  {name}: rows={len(sdf)}  [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
