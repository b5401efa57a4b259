"""merge_asof vs pandas.merge_asof on seeded random numeric data —
covers directions, tolerance, and allow_exact_matches=False (the DuckDB
oracle queries only cover exact-match-allowed timestamp joins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _mk(seed: int, n_left=200, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.choice(np.arange(0, 500), n_left).astype("int64"),
            "lval": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.choice(np.arange(0, 500), n_right).astype("int64"),
            "rval": rng.normal(size=n_right).round(3),
        }
    )
    # pandas merge_asof is underdetermined on duplicate right (k, t); make
    # them unique so both engines have one valid answer
    right = right.drop_duplicates(["k", "t"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tol", [None, 20])
def test_merge_asof_matches_pandas(spark, direction, exact, tol):
    from dask_ssh_docker_spark.operators.asof import merge_asof

    left, right = _mk(seed=42 + (direction == "forward"))
    if direction == "nearest" and not exact:
        # pandas nearest+no-exact has subtle tie rules; covered separately
        pytest.skip("tie semantics differ; nearest+exact covered")

    expected = pd.merge_asof(
        left.sort_values(["t", "k"]).reset_index(drop=True),
        right.sort_values(["t", "k"]).reset_index(drop=True),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tol,
    )

    got = (
        merge_asof(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            direction=direction,
            tolerance=tol,
            allow_exact_matches=exact,
            tiebreak="rval",
        )
        .toPandas()
        .rename(columns={"rval": "rval_spark"})
    )

    key = ["k", "t", "lval"]
    exp = expected.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert len(exp) == len(g)
    pd.testing.assert_series_equal(
        exp["rval"].reset_index(drop=True),
        g["rval_spark"].reset_index(drop=True),
        check_names=False,
    )


def test_merge_asof_no_by(spark):
    """Global (no ``by``) as-of — falls back to a single-partition window;
    correct, and documented as the non-scalable path."""
    from dask_ssh_docker_spark.operators.asof import merge_asof

    left = pd.DataFrame({"t": [1, 5, 10], "lv": ["a", "b", "c"]})
    right = pd.DataFrame({"t": [0, 4, 9], "rv": [10, 40, 90]})
    got = (
        merge_asof(spark.createDataFrame(left), spark.createDataFrame(right), on="t")
        .toPandas()
        .sort_values("t")
    )
    assert got["rv"].tolist() == [10, 40, 90]
    assert got["t_right"].tolist() == [0, 4, 9]
