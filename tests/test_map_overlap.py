"""map_overlap (Dask ``df.map_overlap(fn, before, after)`` signature):
halo-extended per-chunk apply, halo dropped from output — parity against
a single-frame pandas computation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _mk(spark, n=500, keys=3, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "t": np.arange(n),
            "v": rng.normal(size=n).round(6),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_map_overlap_matches_whole_frame_rolling(spark):
    """Centered rolling mean via tiny chunks + halos == pandas on the
    whole per-key frame (chunking must be invisible in the result)."""
    from dask_ssh_docker_spark.functions.udf import map_overlap

    pdf, df = _mk(spark)

    def centered(p: pd.DataFrame) -> pd.DataFrame:
        out = p[["k", "t"]].copy()
        out["m"] = p["v"].rolling(5, center=True, min_periods=1).mean()
        return out

    got = (
        map_overlap(
            df, centered, before=2, after=2,
            schema="k long, t long, m double",
            order_by=["t"], by="k", chunk_rows=16,
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        pdf.sort_values(["k", "t"])
        .groupby("k", group_keys=False)[["k", "t", "v"]]
        .apply(centered)
        .reset_index(drop=True)
    )
    assert len(got) == len(pdf)
    assert np.allclose(got["m"].to_numpy(), want["m"].to_numpy(), atol=1e-12)


def test_map_overlap_shift_parity(spark):
    """An asymmetric halo (before=3, after=0) supports lag-style fns."""
    from dask_ssh_docker_spark.functions.udf import map_overlap

    pdf, df = _mk(spark, n=200, keys=2)

    def lag3(p: pd.DataFrame) -> pd.DataFrame:
        out = p[["k", "t"]].copy()
        out["v3"] = p["v"].shift(3)
        return out

    got = (
        map_overlap(
            df, lag3, before=3, after=0,
            schema="k long, t long, v3 double",
            order_by=["t"], by="k", chunk_rows=10,
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    want = (
        pdf.sort_values(["k", "t"])
        .groupby("k", group_keys=False)[["k", "t", "v"]]
        .apply(lag3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_map_overlap_rejects_row_count_change(spark):
    from dask_ssh_docker_spark.functions.udf import map_overlap

    _, df = _mk(spark, n=50, keys=1)

    def drop_rows(p: pd.DataFrame) -> pd.DataFrame:
        return p[["k", "t"]].head(1)

    out = map_overlap(
        df, drop_rows, before=1, after=1,
        schema="k long, t long", order_by=["t"], by="k", chunk_rows=10,
    )
    with pytest.raises(Exception, match="preserve row count"):
        out.collect()


def test_map_overlap_validates_args(spark):
    from dask_ssh_docker_spark.functions.udf import map_overlap

    _, df = _mk(spark, n=10, keys=1)
    with pytest.raises(ValueError):
        map_overlap(df, lambda p: p, before=-1, after=0,
                    schema="k long", order_by=["t"], by="k")
    with pytest.raises(ValueError):
        map_overlap(df, lambda p: p, before=99, after=0,
                    schema="k long", order_by=["t"], by="k", chunk_rows=10)


def test_map_overlap_rejects_reserved_column_clash(spark):
    """An input column named like an internal helper would be silently
    overwritten then stripped — must raise instead (ADVICE r2)."""
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.functions.udf import map_overlap

    _, df = _mk(spark, n=10, keys=1)
    clashed = df.withColumn("__chunk", F.lit(1))
    with pytest.raises(ValueError, match="reserve"):
        map_overlap(clashed, lambda p: p, before=1, after=1,
                    schema="k long, t long", order_by=["t"], by="k")
