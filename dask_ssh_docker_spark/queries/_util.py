"""Shared helpers for oracle-deterministic aggregation.

Floating-point sums depend on accumulation order, which differs between
Spark's partial/final hash aggregation and DuckDB's execution.  To make
results bit-identical we do measure arithmetic in exact DECIMAL (both
engines implement exact decimal +/*), and cast to DOUBLE only at the end.
Intermediate precisions are kept small enough that neither engine hits
its 38-digit cap (which would trigger engine-specific rounding):

- prices  -> DECIMAL(12,2)   (max |v| ~ 1e8 in testdata)
- rates   -> DECIMAL(3,2)    (discount/tax in [0, 0.99])
- price*(1±rate)        -> DECIMAL(16,4) / DuckDB (15,4)   exact
- price*(1±r1)*(1±r2)   -> DECIMAL(20,6) / DuckDB (18,6)   exact
- SUM over those        -> widened by engine, still exact

Averages: ``CAST(sum_decimal AS DOUBLE) / count`` — one IEEE division on
identical inputs gives identical output in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRICE_DEC = "decimal(12,2)"
RATE_DEC = "decimal(3,2)"


def dec(col: Column | str, typ: str = PRICE_DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, typ: str = PRICE_DEC) -> Column:
    """Exact decimal SUM, surfaced as double."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: Column | str, typ: str = PRICE_DEC) -> Column:
    """Deterministic mean: double(exact decimal sum) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


def sql_dsum(expr: str, typ: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE)"


def sql_davg(expr: str, typ: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr})"


#: row bound for O(n²) VALIDATION baselines — just above the sf0.1 table
#: sizes (documents 5000, embeddings 2000), so every driver-oracle scale
#: (sf0.01/sf0.1) is untouched while full-registry sweeps at sf≥1 stop
#: paying quadratic wall time for queries that exist only to validate
#: their approximate twins (VERDICT r7 item 4).
VALIDATION_MAX_ROWS = 6000


def validation_cap(df, id_col: str, label: str, bound: int = VALIDATION_MAX_ROWS):
    """Deterministically cap an O(n²) validation-baseline input.

    These queries (exact all-pairs Jaccard / cosine and the transitive
    clusters over them) are correctness oracles for the bucketed scale
    paths (MinHash-LSH, SimHash, banded cosine LSH), never products —
    the engine's ``example/test.py:23``-style invariants.  Above the
    bound we keep the ``bound`` smallest ids (one TakeOrdered job over
    the id column only) and PRINT what was dropped — a silent cap would
    read as full coverage.  At or under the bound (every driver-checked
    scale) the frame passes through unchanged."""
    import sys

    # Cheap bound probe first (ADVICE r8): a pruned-to-id_col scan that
    # stops at bound+1 rows, so the driver-oracle / bench scales — where
    # the cap never binds — pay one bounded CollectLimit job instead of a
    # full-table count.  The exact count runs only when the cap binds
    # (sf≥1 sweeps), where it is trivial next to the O(n²) it prevents.
    if df.select(id_col).limit(bound + 1).count() <= bound:
        return df
    # The probe already proved "> bound" — don't run a full count just for
    # the log line (ADVICE r9: on the O(n²)-input frames at sf≥1 that
    # doubles the pre-cap scan cost purely for a number nobody acts on).
    print(
        f"[validation-cap] {label}: input has > {bound} rows (probe); "
        f"keeping the {bound} smallest {id_col} values "
        f"(rest skipped — O(n²) validation baseline, not a "
        f"scale path; the approximate twin covers full scale)",
        file=sys.stderr,
        flush=True,
    )
    keep = df.select(id_col).orderBy(id_col).limit(bound)
    return df.join(F.broadcast(keep), id_col, "leftsemi")
