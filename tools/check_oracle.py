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


def ulp_match(sdf: pd.DataFrame, odf: pd.DataFrame, max_ulp: int) -> tuple[bool, float, str]:
    """Fallback comparison for scales the driver never checks (sf ≥ 1):
    align rows, require non-float cells exactly equal and float cells
    within ``max_ulp`` units-in-the-last-place.

    Why it exists: the engines' DECIMAL→DOUBLE casts round differently in
    the final bit (Spark via BigDecimal.doubleValue is correctly rounded;
    DuckDB's int128·10⁻ᵏ path can be 1 ulp off).  At sf ≤ 0.1 the sums
    are small enough that both land on the same double and the driver's
    exact 6-dp hash holds; at sf1 a ~10¹⁰-magnitude sum exposes the last
    bit.  A ≤2-ulp float match with exact non-float cells is the
    strongest cross-engine equality that EXISTS at that magnitude.

    Returns (ok, worst_ulp_seen, detail)."""
    import math

    if sorted(sdf.columns) != sorted(odf.columns) or len(sdf) != len(odf):
        return False, math.inf, "shape mismatch"
    cols = sorted(sdf.columns)
    sdf, odf = sdf[cols], odf[cols]
    fcols = [c for c in cols if sdf[c].dtype.kind == "f" or odf[c].dtype.kind == "f"]
    kcols = [c for c in cols if c not in fcols]
    # align: sort by non-float key columns when they uniquely identify
    # rows in both frames, else by the full 6-sig-digit canonical string
    if kcols and sdf[kcols].drop_duplicates().shape[0] == len(sdf) \
            and odf[kcols].drop_duplicates().shape[0] == len(odf):
        skey = sdf[kcols].astype(str).agg("|".join, axis=1)
        okey = odf[kcols].astype(str).agg("|".join, axis=1)
        sdf = sdf.iloc[skey.argsort(kind="stable").to_numpy()].reset_index(drop=True)
        odf = odf.iloc[okey.argsort(kind="stable").to_numpy()].reset_index(drop=True)
        if not sdf[kcols].astype(str).equals(odf[kcols].astype(str)):
            return False, math.inf, "key columns differ"
    else:
        def canon(df):
            key = df.apply(
                lambda row: ",".join(
                    f"{v:.6g}" if isinstance(v, float) else norm_cell(v) for v in row
                ),
                axis=1,
            )
            return df.iloc[key.argsort(kind="stable").to_numpy()].reset_index(drop=True)

        sdf, odf = canon(sdf), canon(odf)
        for c in kcols:
            if list(sdf[c].map(norm_cell)) != list(odf[c].map(norm_cell)):
                return False, math.inf, f"non-float column {c} differs"
    worst = 0.0
    for c in fcols:
        for a, b in zip(sdf[c], odf[c]):
            a_nan = a is None or a != a
            b_nan = b is None or b != b
            if a_nan or b_nan:
                if a_nan != b_nan:
                    return False, math.inf, f"{c}: null/NaN mismatch"
                continue
            if a == b:
                continue
            u = math.ulp(max(abs(float(a)), abs(float(b))))
            d = abs(float(a) - float(b)) / u if u else math.inf
            worst = max(worst, d)
            if d > max_ulp:
                return False, worst, f"{c}: {a!r} vs {b!r} = {d:.1f} ulp"
    return True, worst, ""


def _plain_session():
    """Driver simulation: a bare session with none of the engine's conf —
    queries must self-provision any runtime conf they need."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("check-oracle-plain")
        .config("spark.ui.enabled", "false")
        # the GATE collects each full result to hash it (toPandas) — a
        # full-table query at sf≥10 serializes >1 GiB of task results,
        # tripping the 1g default.  This is gate plumbing, not operator
        # behavior: the products never driver-collect unbounded frames
        # (SCALE.md); only this comparison harness does.
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )


def _duck_connect(sf_dir: str):
    """Oracle connection with BOUNDED memory + disk spill (r11): at deep
    sf the exact-baseline oracles (setsim's 26M-row shingle self-join at
    zipf-sf10) outgrow RAM shared with the sweep's Spark JVM — DuckDB's
    default limit is ~80% of the MACHINE, which the JVM already half
    occupies, so the join either malloc-fails or triggers the OOM killer
    (the r11 part-1 sweep died exactly there, exit 137).  A fixed limit
    + temp_directory makes the oracle SPILL instead; insertion order is
    irrelevant (the gate hashes order-insensitively), and dropping it
    lets DuckDB stream more operators.  Override via
    SPARK_GRAFT_DUCKDB_MEM."""
    con = duckdb.connect()
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "40GB")
    # ADVICE r11: mkdtemp + atexit cleanup — the old fixed /tmp path was
    # never removed and a failed deep sweep could leave tens of GB behind.
    import atexit
    import shutil
    import tempfile

    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plain = "--plain" in sys.argv[1:]
    # --both: engine pass then plain pass in ONE process/JVM (VERDICT r9
    # item 6 — the second pass reuses the warmed JIT; SparkContext restart
    # keeps the JVM).  Equivalent coverage to two separate invocations.
    both = "--both" in sys.argv[1:]
    # --ulp N: on hash mismatch, accept aligned rows whose float cells are
    # within N ulp (exact non-floats required) — for sf≥1 sweeps where the
    # engines' decimal→double casts differ in the last bit; the driver's
    # sf0.01 gate never uses this
    ulp_tol = 0
    skip: set[str] = set()
    skip_capped = False
    zipf_dir: str | None = None
    for a in sys.argv[1:]:
        if a.startswith("--ulp"):
            ulp_tol = int(a.split("=")[1]) if "=" in a else 2
        elif a == "--skip-capped":
            # for sf≥1 sweeps: exclude every registry query flagged
            # validation_capped=True (input-capped O(n²) baselines whose
            # oracle only matches at sf≤0.1) — DERIVED from the registry,
            # no hand-maintained list (ADVICE r8)
            skip_capped = True
        elif a.startswith("--skip="):
            # ad-hoc exclusions; each skip is printed so the log stays
            # honest about what did not run
            skip = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--zipf-dir="):
            # deep-sweep corpus routing (VERDICT r10 item 7): queries
            # registered with bench_corpus="zipf" run against THIS dir
            # (Spark and DuckDB both) instead of sf_dir — replaces the
            # documented sf10 skip for setsim_prefix_pairs, whose legacy-
            # vocabulary behavior is a corpus artifact, not the operator
            zipf_dir = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.queries.registry import validation_capped_names

    if skip_capped:
        skip |= validation_capped_names()

    if plain:
        spark = _plain_session()
    else:
        from dask_ssh_docker_spark.session import get_session

        # maxResultSize: gate-only — see _plain_session's comment
        spark = get_session(
            "check-oracle", conf={"spark.driver.maxResultSize": "8g"}
        )

    con = _duck_connect(sf_dir)
    routes = {}
    if zipf_dir:
        routes["zipf"] = (_duck_connect(zipf_dir), zipf_dir)

    unknown = only - set(REGISTRY)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    rc = _run_gate(spark, con, sf_dir, only, skip, ulp_tol, routes)
    if both:
        print("\n== switching to plain driver-like session (same JVM) ==")
        spark.stop()
        spark = _plain_session()
        rc |= _run_gate(spark, con, sf_dir, only, skip, ulp_tol, routes)
    return rc


def _run_gate(spark, con, sf_dir, only, skip, ulp_tol, routes=None) -> int:
    from dask_ssh_docker_spark.queries import REGISTRY

    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP  {name}: excluded by --skip (documented "
                  "validation-scale baseline at this sf)")
            continue
        q_con, q_dir, route_note = con, sf_dir, ""
        if routes and spec.bench_corpus in routes:
            q_con, q_dir = routes[spec.bench_corpus]
            route_note = f" [{spec.bench_corpus}-corpus]"
        t0 = time.time()
        try:
            sdf = spec.fn(spark, q_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle, rows-only)")
            continue
        try:
            odf = q_con.execute(spec.oracle).df()
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
        ulp_note = ""
        if not problems:
            hs, ho = frame_hash(sdf), frame_hash(odf)
            if hs != ho:
                if ulp_tol:
                    ok, worst, detail = ulp_match(sdf, odf, ulp_tol)
                    if ok:
                        ulp_note = f" (floats within {worst:.1f} ulp)"
                    else:
                        problems.append(f"hash {hs} != {ho}; ulp check: {detail}")
                else:
                    problems.append(f"hash {hs} != {ho}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}  [{dt:.1f}s]")
        else:
            print(f"PASS  {name}: rows={len(sdf)}{ulp_note}{route_note}  [{dt:.1f}s]")

    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
