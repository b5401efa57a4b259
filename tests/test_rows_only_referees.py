"""Every rows-only (oracle=None) registry query has a NAMED referee
(VERDICT r10 item 8): the driver's rows-only check proves only rows>0,
so each such query must carry a deterministic in-repo test that pins the
property its oracle cannot express — a recall floor vs the exact twin,
a pure-Python reference parity, golden bytes, an error bound, or a
subset relation to an oracle-checked batch twin.

This file is the consolidation point: the ``REFEREES`` map names every
rows-only query's referee test(s); the meta-test fails when a NEW
rows-only query is registered without one, or when a cited referee test
is renamed away.  Referees too heavy or too entangled with their
operator suites stay in their home files and are CITED here (running
them twice buys nothing); the four driver-window no_oracle rows from
CORRECTNESS_r10 additionally get direct registered-query-level referees
in this file where their home pins were operator-level only.
"""

from __future__ import annotations

import importlib

import pytest

SF = "/root/testdata/sf0.01"

#: rows-only query name -> referee tests ("tests.module::test_name").
#: PARITY.md's rows-only table cites this map.
REFEREES = {
    # similarity / ANN: recall floors vs the exact registered baseline
    "sim_topk_lsh": [
        "tests.test_similarity::test_ann_recall_pinned_at_sf01",
        "tests.test_rows_only_referees::test_lsh_topk_subset_and_recall_sf001",
    ],
    "sim_topk_ivf": ["tests.test_similarity::test_ann_recall_pinned_at_sf01"],
    "sim_topk_pq": ["tests.test_pq::test_sf01_query_recall_vs_bruteforce"],
    "sim_topk_ivfpq": [
        "tests.test_ivfpq::test_registered_query_recall_sf01",
        "tests.test_ivfpq::test_probe_scan_sublinear_in_corpus",
    ],
    "sim_neardup_lsh": [
        "tests.test_similarity::test_lsh_neardup_subset_of_exact",
        "tests.test_similarity::test_neardup_recall_at_scale",
    ],
    # sim_mmr_rerank: promoted to a full DuckDB oracle in r13 (unrolled
    # 5-round greedy over the 6-dp-rounded relevance, queries/similarity
    # ._mmr_oracle_sql); the pure-Python parity pin
    # (test_wave5::test_mmr_parity_with_reference) still runs in its
    # home file.
    # dedup family: exact-Jaccard / all-pairs-CC parity at validation n
    "dedup_minhash_clusters": [
        "tests.test_dedup::test_minhash_verified_pairs_match_exact",
        "tests.test_dedup::test_minhash_clusters_shape",
    ],
    "dedup_clusters_minhash_cc": [
        "tests.test_dedup::test_minhash_cc_clusters_equal_allpairs_cc"
    ],
    # dedup_simhash_pairs: promoted to a full DuckDB oracle in r13 (the
    # registry query runs the md5_60 cross-engine token-hash family, so
    # the 60-bit bit-vote signature + 4×15-bit pigeonhole banding +
    # xor/bit_count verify are recomputed bit-exactly in SQL).  The
    # xxhash64-default behavior pins (test_dedup::
    # test_simhash_identical_and_disjoint, test_simhash_pairs_are_
    # textually_similar) and the banded==all-pairs exactness pin
    # (test_simhash_md5_60_banded_equals_all_pairs) run in their home
    # file.
    # dedup_canonical_survivors: promoted to a full DuckDB oracle in r12
    # (lossless prefix-filter pair graph + recursive-CTE CC) — its
    # invariants pin (test_wave7::test_canonical_survivors_invariants)
    # still runs in its home file.
    # dedup_winnow_spans: promoted to a full DuckDB oracle in r13 (the
    # numpy polynomial hash recomputed exactly via an O(n) modular-
    # inverse prefix-sum, queries/dedup._winnow_oracle_sql); the density
    # and detection-guarantee pins (tests/test_substring.py) still run
    # in their home file.
    "dedup_semantic_semdedup": [
        "tests.test_semdedup::test_greedy_matches_naive_reference",
        "tests.test_semdedup::test_survivors_mutually_below_tau",
        "tests.test_semdedup::test_dropped_rows_have_kept_condemner",
    ],
    # corpus_overlap_minhash: promoted to a full DuckDB oracle in r12
    # (md5-derived universal-hash family both engines compute
    # bit-identically); the estimate-tracks-exact pin
    # (test_semdedup::test_corpus_overlap_minhash_tracks_exact) still
    # runs in its home file.
    # sketches: error bound vs exact
    "approx_distinct_quantiles": [
        "tests.test_approx_io_concat::test_approx_count_distinct_bound"
    ],
    "rollup_cascade_daily_hll": [
        "tests.test_relational::test_hll_cascade_equals_direct_sketch",
        "tests.test_rows_only_referees::test_hll_query_within_error_of_exact",
    ],
    # multimodal: golden bytes / deterministic fakes
    "multimodal_decode_stub": [
        "tests.test_runner_streaming_multimodal::test_decode_stub_deterministic_and_fake_labeled"
    ],
    "multimodal_decode_image": [
        "tests.test_runner_streaming_multimodal::test_decode_image_known_png_mapinarrow",
        "tests.test_runner_streaming_multimodal::test_decode_image_pil_parity_when_present",
    ],
    "multimodal_decode_audio": [
        "tests.test_runner_streaming_multimodal::test_decode_audio_query_roundtrip"
    ],
    "multimodal_image_features": [
        "tests.test_image_features::test_solid_color_features_exact",
        "tests.test_image_features::test_near_dup_images_small_hamming",
    ],
    # streaming: subset-of-batch-twin (the twin carries the oracle)
    "stream_sessionize": [
        "tests.test_rows_only_referees::test_stream_sessions_subset_of_batch"
    ],
}


def test_every_rows_only_query_has_a_referee():
    """The gate: rows-only registration without a named referee fails
    here, and a referee citation that points at a deleted/renamed test
    fails here — PARITY.md's 20/20 claim is enforced, not asserted."""
    from dask_ssh_docker_spark.queries import REGISTRY

    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    missing = rows_only - set(REFEREES)
    assert not missing, f"rows-only queries without a referee: {sorted(missing)}"
    stale = set(REFEREES) - rows_only
    assert not stale, f"referees for non-rows-only names: {sorted(stale)}"
    for name, refs in REFEREES.items():
        assert refs, name
        for ref in refs:
            mod_name, test_name = ref.split("::")
            mod = importlib.import_module(mod_name)
            assert hasattr(mod, test_name), f"{name}: referee {ref} not found"


def test_lsh_topk_subset_and_recall_sf001(spark):
    """Registered-query-level LSH referee at the driver's own sf
    (CORRECTNESS runs at sf0.01): every LSH neighbor is a real corpus
    vector the exact query could return (subset of the candidate space —
    LSH never fabricates ids) and recall@10 vs the registered brute-force
    twin clears the floor.  Complements the sf0.1 pin in
    test_similarity."""
    from dask_ssh_docker_spark.queries import REGISTRY

    exact = {
        (r.query_id, r.vec_id)
        for r in REGISTRY["sim_topk_bruteforce"].fn(spark, SF).collect()
    }
    lsh_rows = REGISTRY["sim_topk_lsh"].fn(spark, SF).collect()
    lsh = {(r.query_id, r.vec_id) for r in lsh_rows}
    assert all(q in {0, 1, 2, 3, 4} for (q, _) in lsh)
    assert all(v >= 5 for (_, v) in lsh), "LSH returned a query id as neighbor"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.8, f"sim_topk_lsh recall@10 @sf0.01 = {recall}"


def test_hll_query_within_error_of_exact(spark):
    """Registered-query-level HLL referee: rollup_cascade_daily_hll's
    approx_users lands within 5% of the EXACT per-bucket distinct count
    (the property the driver's rows-only check cannot see)."""
    from pyspark.sql import functions as F

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.sources import load_table

    got = REGISTRY["rollup_cascade_daily_hll"].fn(spark, SF)
    ev = load_table(spark, SF, "events")
    exact = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "exact")
    )
    j = got.join(exact, ["bucket_start", "event_type"]).collect()
    assert j, "no joined buckets — schema drift between query and referee"
    for r in j:
        assert abs(r.approx_users - r.exact) <= max(1, 0.05 * r.exact), (
            r.bucket_start,
            r.event_type,
            r.approx_users,
            r.exact,
        )


def test_stream_sessions_subset_of_batch(spark):
    """stream_sessionize emits only watermark-FINALIZED sessions (append
    mode); every emitted row must equal — on all five columns — a row of
    the oracle-checked batch twin sessionize_10m.  Session-window close
    semantics differ only in the gap-extension of session_end, which both
    twins apply identically, so finalized sessions match exactly."""
    from dask_ssh_docker_spark.queries import REGISTRY

    stream_rows = REGISTRY["stream_sessionize"].fn(spark, SF).collect()
    assert stream_rows, "stream emitted no finalized sessions"
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in REGISTRY["sessionize_10m"].fn(spark, SF).collect()
    }
    missing = [
        r
        for r in stream_rows
        if (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        not in batch
    ]
    assert not missing, f"stream sessions absent from batch twin: {missing[:5]}"
