"""Plan-quality assertions: the 100 TB properties (pushdown, pruning,
broadcast, bounded shuffles, codegen, no Python row-eval) checked on the
actual executed plans at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def reg():
    from dask_ssh_docker_spark.queries import REGISTRY

    return REGISTRY


def test_q1_filter_pushdown_and_pruning(spark, sf_dir, reg):
    from dask_ssh_docker_spark.plans import has_pushed_filters, scan_columns

    df = reg["q1_pricing_summary"].fn(spark, sf_dir)
    assert has_pushed_filters(df, "l_shipdate")
    cols = scan_columns(df)[0]
    # 7 needed columns, not all 11
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_q5_broadcasts_dims_single_fact_shuffle(spark, sf_dir, reg):
    from dask_ssh_docker_spark.plans import count_exchanges, has_broadcast_join

    df = reg["q5_region_revenue"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # shuffles: lineitem<->orders join + final agg (+1 AQE artifacts max)
    assert count_exchanges(df) <= 3


def test_no_forced_broadcast_of_scaling_tables(spark, sf_dir, reg):
    """Broadcast hints are allowed ONLY on fixed-cardinality dims
    (region=5 / nation=25 rows at every SF).  customer/supplier/part grow
    linearly with SF — a forced hint there OOMs executors at 100 TB, so
    those joins must be left to AQE's size-threshold dynamic broadcast."""
    from dask_ssh_docker_spark.plans import hinted_broadcast_tables

    fixed_dim_cols = {"n_nationkey", "r_regionkey"}
    for qname in (
        "q3_top_unshipped_orders",
        "q5_region_revenue",
        "q10_returned_revenue",
        "q14_promo_share",
        "q19_disjunctive_predicates",
    ):
        hinted = hinted_broadcast_tables(reg[qname].fn(spark, sf_dir))
        assert hinted <= fixed_dim_cols, (qname, hinted)


def test_no_hinted_broadcast_of_unbounded_aggregates(spark, sf_dir, reg):
    """A forced broadcast of a GROUPED aggregate (e.g. a distinct-terms
    vocabulary) scales with data cardinality and bypasses AQE's size
    threshold — guaranteed executor OOM at 100 TB.  Swept across every
    registered batch query.  Global (ungrouped) aggregates are exempt:
    exactly one row, bounded forever."""
    from dask_ssh_docker_spark.plans import hinted_unbounded_aggregate_broadcasts

    for name, spec in reg.items():
        if spec.fn.__module__.endswith("queries.streaming"):
            continue
        bad = hinted_unbounded_aggregate_broadcasts(spec.fn(spark, sf_dir))
        assert not bad, (name, bad)


def test_tfidf_vocabulary_not_force_broadcast(spark, sf_dir, reg):
    """The TF-IDF document-frequency table (one row per distinct corpus
    term — unbounded on web text) must not carry a forced broadcast hint;
    only the 1-row global n_docs aggregate may."""
    from dask_ssh_docker_spark.plans import (
        _broadcast_hint_nodes,
        hinted_unbounded_aggregate_broadcasts,
    )

    df = reg["text_tfidf_top_terms"].fn(spark, sf_dir)
    assert hinted_unbounded_aggregate_broadcasts(df) == []
    # the surviving hint(s) are global aggregates only
    for node in _broadcast_hint_nodes(df):
        assert "Aggregate" in node.child().toString()


def test_tfidf_single_scan_stage_reuse(spark, sf_dir, reg):
    """r10: tf feeds both the df derivation and the scoring join; the
    two branches must share ONE (doc_id, doc_len, term) exchange so the
    tokenize + count runs once — the reuse replaced a lazy
    localCheckpoint (corpus-scale local-disk materialization at 100×).
    The sharing depends on df's aggregate referencing the cnt output
    (`cnt >= 1` blocks the column pruning that would diverge the partial
    aggregates).  Pin the runtime proof: ReusedExchange in the executed
    adaptive plan."""
    df = reg["text_tfidf_top_terms"].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, (
        "no ReusedExchange — the df branch is re-tokenizing the corpus "
        "instead of reusing the tf pre-aggregate stage"
    )


def test_theta_join_broadcasts_bounded_side(spark, sf_dir, reg):
    """join_range_theta hints the constant-size filtered orders side,
    never the SF-growing part table."""
    from dask_ssh_docker_spark.plans import hinted_broadcast_tables

    hinted = hinted_broadcast_tables(reg["join_range_theta"].fn(spark, sf_dir))
    assert hinted and all(c.startswith("o_") for c in hinted), hinted


def test_topk_is_take_ordered(spark, sf_dir, reg):
    from dask_ssh_docker_spark.plans import has_take_ordered

    assert has_take_ordered(reg["topk_orders"].fn(spark, sf_dir))


def test_asof_single_shuffle(spark, sf_dir, reg):
    from dask_ssh_docker_spark.plans import count_exchanges

    assert count_exchanges(reg["asof_backward"].fn(spark, sf_dir)) == 1


def test_no_python_row_eval_anywhere(spark, sf_dir, reg):
    """BatchEvalPython (row-at-a-time Python) must never appear; only
    Arrow-batched paths are sanctioned for the Python-crossing ops."""
    from dask_ssh_docker_spark.plans import uses_python_eval

    for name, spec in reg.items():
        if spec.fn.__module__.endswith("queries.streaming"):
            continue  # streaming queries execute eagerly on construction
        assert not uses_python_eval(spec.fn(spark, sf_dir)), name


def test_scalar_projection_single_codegen_span(spark, sf_dir, reg):
    from dask_ssh_docker_spark.plans import codegen_span_count

    # pure projection pipelines should fuse into one codegen span
    assert codegen_span_count(reg["str_functions"].fn(spark, sf_dir)) == 1
    assert codegen_span_count(reg["math_functions"].fn(spark, sf_dir)) == 1


def test_pruned_metadata_scan_skips_blob(spark, sf_dir):
    """Metadata-only query over a blob table must not read the bytes."""
    from dask_ssh_docker_spark.plans import scan_columns
    from dask_ssh_docker_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "n_chars")  # no text
    cols = scan_columns(q)
    assert cols and set(cols[0]) == {"doc_id", "n_chars"}


def test_broadcast_hint_respected(spark, sf_dir):
    from dask_ssh_docker_spark.plans import has_broadcast_join
    from dask_ssh_docker_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    j = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    )
    assert has_broadcast_join(j)


def test_gopher_quality_partial_aggregation(spark, sf_dir, reg):
    """Both aggregation hops of the Gopher gate must partial-agg (a
    partial/final HashAggregate pair around each Exchange) — the property
    that makes the (doc,token) shuffle map-side combinable at 100 TB."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["text_gopher_quality"].fn(spark, sf_dir))
    import re

    assert len(re.findall(r"HashAggregate", plan)) >= 4  # partial+final ×2 hops
    assert "BatchEvalPython" not in plan


def test_contamination_broadcasts_eval_grams(spark, sf_dir, reg):
    """The eval-gram side of the decontamination join must broadcast —
    the corpus never shuffles for the join."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["text_contamination_flags"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_get_dummies_no_shuffle(spark, sf_dir, reg):
    """Declared-domain one-hot is pure map-side: zero exchanges."""
    from dask_ssh_docker_spark.plans import count_exchanges

    assert count_exchanges(reg["get_dummies_segment"].fn(spark, sf_dir)) == 0


def test_pipeline_splits_are_shuffle_free(spark, sf_dir, reg):
    """Hash-based split / stratified-sample / PII-redaction queries are
    pure map-side projections+filters: zero exchanges at any scale."""
    from dask_ssh_docker_spark.plans import count_exchanges

    for q in (
        "split_train_val_md5",
        "sample_stratified_by_source",
        "text_pii_redaction",
    ):
        assert count_exchanges(reg[q].fn(spark, sf_dir)) == 0, q


def test_pack_sequences_partitioned_cumsum(spark, sf_dir, reg):
    """Sequence packing cumsums WITHIN source partitions — one hash
    exchange on source, and no single-partition global-order window
    (the 100 TB shape: shards pack independently)."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["pack_sequences_greedy"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "Exchange SinglePartition" not in physical_plan(df)


def test_top_terms_partial_aggregation(spark, sf_dir, reg):
    """The (source, term) count must partial-agg before its exchange so
    the exploded-token shuffle is map-side combined; the ranking window
    runs over the aggregated (vocabulary-sized) frame only."""
    import re

    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["top_terms_per_source"].fn(spark, sf_dir))
    assert len(re.findall(r"HashAggregate", plan)) >= 2  # partial+final


def test_groupby_transform_single_shuffle(spark, sf_dir, reg):
    """transform = unordered window over the group key: ONE exchange, no
    self-join of the stats back onto the rows."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["groupby_transform_scale"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "SortMergeJoin" not in physical_plan(df)


def test_q21_window_decorrelation_no_self_join_explosion(spark, sf_dir, reg):
    """The EXISTS/NOT-EXISTS pair of q21 decorrelates to ONE window pass
    over the already-shuffled join key: exactly one scan of lineitem, no
    triple self-join, and no single-partition window."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["q21_waiting_supplier"].fn(spark, sf_dir))
    assert plan.count("FileScan parquet") <= 3  # lineitem + orders + supplier
    assert "Exchange SinglePartition" not in plan or "collect_set" not in plan


def test_q2_window_reuses_aggregation_partitioning(spark, sf_dir, reg):
    """The per-part min window in q2 must not introduce a shuffle beyond
    the (part,supp) aggregation + the name joins: the window partitions
    on a prefix of the agg keys."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["q2_min_cost_supplier"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[-1]
    # groupBy (part,supp) + window repartition on part + AQE artifacts;
    # the two name joins must broadcast (filtered part, supplier) not shuffle
    assert count_exchanges(df) <= 3


def test_embedding_centroids_partial_aggregated(spark, sf_dir, reg):
    """The rows×dim exploded frame must partial-agg (map-side combine)
    before its exchange, and the final assembly groups O(labels×dim)
    cells only."""
    import re

    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["embedding_centroids_by_label"].fn(spark, sf_dir))
    assert len(re.findall(r"(?:Hash|ObjectHash|Sort)Aggregate", plan)) >= 4
    assert "BatchEvalPython" not in plan


def test_funnel_single_exchange(spark, sf_dir, reg):
    """Three funnel stages + final dedup must reuse ONE user_id hash
    partitioning — funnel depth costs projections, not shuffles."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["funnel_view_click_purchase"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "Exchange SinglePartition" not in physical_plan(df)


def test_ewma_single_exchange_no_python(spark, sf_dir, reg):
    """Bounded EWMA is one user_id window exchange with the fold entirely
    in JVM expressions — no Python eval, no global-order window."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["window_ewma_bounded"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = physical_plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_qcut_boundary_is_global_aggregate_broadcast(spark, sf_dir, reg):
    """qcut's only hinted broadcast is the 1-row percentile boundary
    aggregate (bounded forever); the labeling side never shuffles."""
    from dask_ssh_docker_spark.plans import (
        _broadcast_hint_nodes,
        hinted_unbounded_aggregate_broadcasts,
    )

    df = reg["qcut_order_price_quartiles"].fn(spark, sf_dir)
    assert hinted_unbounded_aggregate_broadcasts(df) == []
    nodes = _broadcast_hint_nodes(df)
    assert nodes and all("Aggregate" in n.child().toString() for n in nodes)


def test_scd2_single_exchange(spark, sf_dir, reg):
    """Both SCD2 windows (change-detect lag + interval lead) share one
    (key, time) ordering -> Catalyst must plan exactly ONE hash exchange."""
    from dask_ssh_docker_spark.plans import count_exchanges

    df = reg["scd2_priority_history"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1


def test_merge_upsert_full_outer_not_broadcast(spark, sf_dir, reg):
    """The CDC merge join must stay a shuffle join: a broadcast full-outer
    is impossible, and a CDC batch can be arbitrarily large."""
    df = reg["cdc_merge_upsert"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "BroadcastHashJoin FullOuter" not in plan


def test_target_encode_loo_single_exchange_no_join(spark, sf_dir, reg):
    """LOO target encoding must be ONE whole-partition window on the
    category key — a join-back implementation would add a second
    exchange and a join."""
    from dask_ssh_docker_spark.plans import count_exchanges, physical_plan

    df = reg["target_encode_loo"].fn(spark, sf_dir)
    assert count_exchanges(df) == 1
    assert "Join" not in physical_plan(df)


def test_decayed_activity_plain_count_shuffle_shape(spark, sf_dir, reg):
    """Half-life decay weighting is map-side: the plan is exactly a
    partial/final aggregate over one exchange, same as a plain per-user
    count."""
    from dask_ssh_docker_spark.plans import count_exchanges

    assert count_exchanges(reg["decayed_user_activity"].fn(spark, sf_dir)) == 1


def test_pareto_front_no_global_window_over_raw_orders(spark, sf_dir, reg):
    """The skyline's ordered scan must run over the day-grain summary:
    the Window node's input comes from an Aggregate, never the raw
    orders scan (a raw-row global window would single-partition 1.5M
    rows at sf1)."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["pareto_front_orders"].fn(spark, sf_dir))
    # aggregation happens below the window: both appear, and the plan
    # has an aggregate on the window's input side
    assert "Window" in plan and "HashAggregate" in plan
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], "window must sit over the day summary"


def test_brown_smoothing_single_exchange_two_windows(spark, sf_dir, reg):
    """Both smoothing passes share the (user, day) ordering — Catalyst
    must plan ONE exchange beyond the daily-grain aggregation (two total:
    day grouping + user window), not one per window."""
    from dask_ssh_docker_spark.plans import count_exchanges

    assert count_exchanges(reg["holt_brown_forecast"].fn(spark, sf_dir)) <= 2


def test_bitmap_distinct_partially_aggregates(spark, sf_dir, reg):
    """The bitmap path must partial-aggregate (bitmap merge is
    associative): two HashAggregate levels around each exchange, and no
    Expand (the COUNT DISTINCT rewrite it replaces)."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["bitmap_distinct_users"].fn(spark, sf_dir))
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2


def test_global_ordered_summaries_have_no_unpartitioned_window(spark, sf_dir, reg):
    """The r4 'global-window quantile/ranking class' scale fix: the four
    queries that used to plan a single-partition ordered window (ntile /
    row_number / running sum over the whole frame) now decompose through
    operators/ranking.py — every Window in their plans must carry a
    partition key (the sketch bucket), so no task ever sorts the whole
    grain."""
    from dask_ssh_docker_spark.plans import unpartitioned_window_count

    for qname in (
        "rfm_customer_segments",
        "abc_part_classification",
        "gini_revenue_concentration",
        "mannwhitney_click_view",
    ):
        df = reg[qname].fn(spark, sf_dir)
        assert unpartitioned_window_count(df) == 0, qname


def test_substring_spans_jvm_only_hash_keys(spark, sf_dir, reg):
    """The stride-1 substring-dedup plan must be pure JVM (gram hashing,
    dup-key count, semi-join, island window — no Python eval anywhere)
    and must key on xxhash64 pairs, not gram text."""
    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["dedup_substring_spans"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan
    assert "LeftSemi" in plan
    assert "Exchange SinglePartition" not in plan


def test_winnow_spans_one_arrow_pass(spark, sf_dir, reg):
    """Winnowed dedup crosses Python exactly once: the fingerprint frame
    is lineage-cut before its two consumers (dup-key groupBy + semi-join),
    so the plan shows the cut scan, not two MapInPandas instances; all
    downstream work is JVM."""
    import re

    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["dedup_winnow_spans"].fn(spark, sf_dir))
    # a second MapInPandas instance would mean the Python pass runs twice
    assert len(re.findall(r"MapInPandas", plan)) == 0
    assert "BatchEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ivfpq_rerank_broadcasts_bounded_sides(spark, sf_dir, reg):
    """IVF-PQ search (r14 shape): the encode Arrow pass appears EXACTLY
    once — inside the bounded shortlist broadcast child (the former eager
    localCheckpoint paid a whole extra job to hide it; the code index has
    a single consumer, so a second MapInPandas would mean the corpus is
    being double-encoded).  The only single-partition exchange allowed is
    the shortlist's no-op ``limit(|Q|·k·expand)`` — the bound that makes
    the broadcast hint legal — never a collapse of the code index or the
    corpus; it must therefore feed a GlobalLimit."""
    import re

    from dask_ssh_docker_spark.plans import physical_plan

    plan = physical_plan(reg["sim_topk_ivfpq"].fn(spark, sf_dir))
    assert len(re.findall(r"MapInPandas", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) == 1
    assert "GlobalLimit" in plan


def test_profile_no_expand(spark, sf_dir):
    """profile_orders_columns must stay the union-of-single-column-
    aggregates shape: a multi-count-distinct Expand duplicates every
    input row (|distinct aggs|+1)x at full width (r8: 20.7 s vs 1.5 s
    at sf1)."""
    from dask_ssh_docker_spark.queries import REGISTRY

    df = REGISTRY["profile_orders_columns"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_lsh_topk_dedups_bare_ids(spark, sf_dir, reg):
    """r9 late materialization (operators/similarity.py:lsh_topk): the
    bucket-join candidate dedup must move NO vector payloads — the
    ``lsh_bucketed`` explode would otherwise multiply every embedding
    ×tables through the exchange, behind a Python-UDF node that hides
    size stats from the planner (the shape that cost lsh_neardup_pairs
    272 s at sf1 before its r6 fix).  The Deduplicate node's output must
    be exactly the two id columns, no array types."""
    from dask_ssh_docker_spark.plans import _iter_plan_nodes

    df = reg["sim_topk_lsh"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed()
    dedups = [
        n
        for n in _iter_plan_nodes(plan)
        if n.getClass().getSimpleName() == "Deduplicate"
    ]
    assert dedups, "expected a Deduplicate (dropDuplicates) node in sim_topk_lsh"
    pair_dedups, reattach_dedups = [], []
    for n in dedups:
        out = n.output()
        names = sorted(out.apply(i).name() for i in range(out.length()))
        types = [out.apply(i).dataType().simpleString() for i in range(out.length())]
        if "query_id" in names and "vec_id" in names:
            # the candidate-PAIR dedup: exactly the two ids, no payloads
            assert names == ["query_id", "vec_id"], names
            assert not any("array" in t for t in types), types
            pair_dedups.append(n)
        else:
            # ADVICE r9 re-attach dedup: ONE id + its vector (each vector
            # crosses this exchange once — never ×tables)
            assert len(names) == 2, names
            assert names[0] in ("__cvec", "__qvec"), names
            reattach_dedups.append(n)
    assert pair_dedups, "expected the bare-id candidate-pair Deduplicate"
    assert len(reattach_dedups) == 2, (
        "expected both re-attach sides deduped on their id (ADVICE r9: "
        "duplicate input ids must not multiply candidate pairs)"
    )


def test_inverted_index_no_arrays_before_topk(spark, sf_dir, reg):
    """r10 (VERDICT r9 item 1): inverted_index_postings must never build
    a posting array for a term that doesn't survive the top-50 cut — a
    stopword-grade term's collect_set buffer scales linearly with the
    corpus (tens of millions of ids in one hash-agg cell at 100 TB).
    Pin: every collect_* aggregate in the plan sits downstream of a
    LeftSemi join (i.e. its input is already filtered to the bounded
    top-df term set, which arrives via the counts-only first pass)."""
    from dask_ssh_docker_spark.plans import _iter_plan_nodes

    df = reg["inverted_index_postings"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed()
    collect_aggs = [
        n
        for n in _iter_plan_nodes(plan)
        if n.getClass().getSimpleName() == "Aggregate"
        and "collect_" in n.aggregateExpressions().toString()
    ]
    assert collect_aggs, "expected the bounded postings collect_set pass"
    for agg in collect_aggs:
        semis = [
            c
            for c in _iter_plan_nodes(agg)
            if c.getClass().getSimpleName() == "Join"
            and "LeftSemi" in c.joinType().toString()
        ]
        assert semis, (
            "collect_* aggregate without a LeftSemi term filter upstream "
            "— posting arrays would buffer for EVERY term before the "
            "top-k cut"
        )


def test_q15_single_scan_stage_reuse(spark, sf_dir, reg):
    """r10 audit: q15's revenue aggregate feeds the MAX branch and the
    winner filter; the scan filters must stay aligned (explicit
    isnotnull(l_suppkey) matching the join's inferred pushdown) so the
    exchange reuses instead of scanning filtered lineitem twice."""
    df = reg["q15_top_supplier"].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, (
        "no ReusedExchange — the MAX branch re-scans lineitem; check "
        "that both branches' pushed filters still align"
    )


def test_corpus_overlap_single_scan_stage_reuse(spark, sf_dir, reg):
    """r10: corpus_overlap_sources' sizes branch and pair branch must
    share the one vocabulary aggregate exchange (shingle text shuffles
    once) — this replaced a corpus-scale lazy localCheckpoint (an
    executor-local materialization that is also a fault barrier: the
    cut lineage cannot recompute a lost executor's blocks, while reused
    shuffle output can)."""
    df = reg["corpus_overlap_sources"].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, (
        "no ReusedExchange — a consumer branch is re-running the "
        "tokenize→shingle pipeline instead of reusing the vocabulary "
        "aggregate's exchange"
    )


def test_inverted_index_single_scan_stage_reuse(spark, sf_dir, reg):
    """r10 second pass (BENCH_NOTES r10 §5): the counts branch and the
    postings branch must share ONE (term, did) pre-aggregate exchange so
    the corpus is scanned + tokenized once, not twice.  The sharing
    depends on the `tf >= 1` pushdown barrier in the semi-join condition
    — without it PushDownLeftSemiAntiJoin rewrites the postings branch
    into its own scan subtree (measured: the re-scan alone costs as much
    as all of pass 1 at sf1).  Pins: (a) the analyzed semi-join condition
    still references the aggregate output (the barrier survives), (b) the
    executed adaptive plan contains a ReusedExchange — the runtime proof
    that the second consumer read the first one's shuffle output."""
    from dask_ssh_docker_spark.plans import _iter_plan_nodes

    df = reg["inverted_index_postings"].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed()
    semi_conds = [
        n.condition().toString()
        for n in _iter_plan_nodes(analyzed)
        if n.getClass().getSimpleName() == "Join"
        and "LeftSemi" in n.joinType().toString()
    ]
    assert any(
        "tf" in c and ">=" in c for c in semi_conds
    ), f"pushdown barrier (tf >= 1) missing from the semi-join: {semi_conds}"
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final, (
        "no ReusedExchange in the executed plan — the postings branch is "
        "re-scanning and re-tokenizing the corpus instead of reusing the "
        "(term, did) pre-aggregate stage"
    )


def test_exact_dedup_groups_bounded_member_buffer(spark, sf_dir, reg):
    """r10 (VERDICT r9 item 1) + r11 (VERDICT r10 residual 1):
    dedup_exact_groups' member_ids readout must be rank-bounded BEFORE
    aggregation — collect_list over a raw content-hash group buffers the
    whole dup-group (a boilerplate doc duplicated millions of times =
    one array the size of the problem).  Pins: (a) the collect_list
    argument is the CASE WHEN rank guard, fed by a Window row_number in
    its subtree; (b) the shipped query runs the SALTED shape (the
    window partitions by (fp, __salt) so AQE's inability to split
    window partitions cannot make one task sort a hot group; measured
    2.07x at 2M rows / 20% hot, tools/skew_probe.py claim 3) — exactly
    two exchanges: the (fp,salt) window shuffle + the combine-friendly
    groupBy(fp) merge; (c) the salt=1 library shape still collapses to
    the minimal single-exchange reuse plan."""
    from dask_ssh_docker_spark.operators.dedup import exact_dedup_groups
    from dask_ssh_docker_spark.plans import (
        _iter_plan_nodes,
        count_exchanges,
        physical_plan,
    )
    from dask_ssh_docker_spark.sources import load_table

    df = reg["dedup_exact_groups"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed()
    collect_aggs = [
        n
        for n in _iter_plan_nodes(plan)
        if n.getClass().getSimpleName() == "Aggregate"
        and "collect_list" in n.aggregateExpressions().toString()
    ]
    assert len(collect_aggs) == 1
    agg = collect_aggs[0]
    exprs = agg.aggregateExpressions().toString()
    assert "CASE WHEN" in exprs and "__rn" in exprs, exprs
    windows = [
        c
        for c in _iter_plan_nodes(agg)
        if c.getClass().getSimpleName() == "Window"
    ]
    assert windows, "expected the rank-guard Window below the aggregate"
    wspec = windows[0].toString()
    assert "__salt" in wspec, f"shipped query must use the salted window: {wspec}"
    assert count_exchanges(df) == 2, physical_plan(df)

    docs = load_table(spark, sf_dir, "documents")
    plain = exact_dedup_groups(docs, "text", "doc_id", salt=1)
    assert count_exchanges(plain) == 1, physical_plan(plain)
