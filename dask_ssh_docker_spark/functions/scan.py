"""Cumulative-scan column builders (SURVEY.md §2.E cumsum family —
``dd.DataFrame.cumsum/cummax/cummin/cumprod`` [Dask public API], anchor
``/root/reference/dask_ssh_docker/__init__.py:307``).

``cumsum``/``cummax``/``cummin`` map 1:1 onto window aggregates.  Spark has
no ``product`` window aggregate, so :func:`cumulative_product` decomposes a
running product into three window sums — all JVM-side expressions inside
WholeStageCodegen, scan-shaped (one shuffle on the partition key, then a
single ordered pass per key), so it scales exactly like ``cumsum``:

- zero handling:  any zero in the prefix pins the product to 0.0;
- sign handling:  parity of the count of negative factors;
- magnitude:      ``exp(sum(ln(abs(x))))`` over the nonzero factors
  (log-domain accumulation — overflows to ``inf`` only where the true
  product would).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cumulative_product(c: Column | str, w: WindowSpec) -> Column:
    """Running product of ``c`` over window spec ``w`` (a cumulative
    ``rowsBetween(unboundedPreceding, currentRow)`` frame for cumprod
    semantics), sign- and zero-aware.

    Floating-point note: the magnitude accumulates ``ln`` terms in frame
    order (deterministic given a total order), so results are reproducible
    run-to-run; they carry log-domain rounding of ~1 ulp per factor, which
    callers should absorb with a final ``round`` when comparing across
    engines.
    """
    x = _col(c).cast("double")
    n_zero = F.sum(F.when(x == 0.0, F.lit(1)).otherwise(F.lit(0))).over(w)
    n_neg = F.sum(F.when(x < 0.0, F.lit(1)).otherwise(F.lit(0))).over(w)
    # when() without otherwise() yields NULL for zero/null factors → sum
    # skips them (pandas skipna=True semantics for the running product).
    log_mag = F.sum(F.when(x != 0.0, F.log(F.abs(x)))).over(w)
    sign = F.when(F.pmod(n_neg, F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    # A NULL factor yields NULL at ITS row but is skipped downstream —
    # matching pandas Series.cumprod() (skipna=True), not "treat as 1".
    return F.when(x.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(n_zero > 0, F.lit(0.0)).otherwise(
            sign * F.exp(F.coalesce(log_mag, F.lit(0.0)))
        )
    )
