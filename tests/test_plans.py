"""Physical-plan shape guards: catch performance regressions (lost
broadcast, lost pushdown, surprise sort-merge joins) before they cost
hours at real scale. These assert on explain output, not timings, so
they are stable on noisy machines."""

from __future__ import annotations

import re

import pytest

from logging_spark import contract

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _no_memo():
    # contract memoizes shared upstream frames via localCheckpoint for
    # the driver's sweep; plan guards must see the REAL query plans
    contract.set_memo(False)
    yield
    contract.set_memo(True)


def _n_exchanges(plan: str) -> int:
    # tree form: "+- Exchange (3)"; excludes BroadcastExchange
    return len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))


def _plan(spark, name: str) -> str:
    df = contract.build_queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def _plan_exec(spark, name: str) -> str:
    """executedPlan tree string (shows partitioning expressions)."""
    df = contract.build_queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_enrich_is_broadcast_join(spark):
    plan = _plan(spark, "pipe_enrich_j4")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q1_pushes_shipdate_filter(spark):
    plan = _plan(spark, "tpch_q1_pricing")
    assert "LessThanOrEqual(l_shipdate" in plan


def test_tpch_q3_broadcasts_dims(spark):
    plan = _plan(spark, "tpch_q3_top_revenue")
    assert "SortMergeJoin" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed to scan


def test_scan_prunes_columns(spark):
    # 2-column projection must not read the whole documents schema
    plan = _plan(spark, "text_fingerprint")
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_sessionize_single_shuffle(spark):
    plan = _plan(spark, "pipe_sessionize")
    # both window functions share one (key, ts) sort: exactly one
    # shuffle exchange, and no second Sort between the Window nodes
    assert _n_exchanges(plan) == 1, plan[:2000]


def test_near_dup_has_no_cross_join(spark):
    # the production near-dup path must be LSH-bucketed equi-joins:
    # an O(n^2) cross join here is a scale-killer at any real corpus
    plan = _plan(spark, "sim_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sharded_topk_has_no_broadcast_of_candidates(spark):
    # candidate matrix must flow through the shard shuffle, never a
    # driver collect/broadcast (that is brute_force_topk's small path)
    plan = _plan(spark, "sim_topk_sharded")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_route_adds_no_shuffle(spark):
    # route = dedup + enrich(broadcast) + explode: must add zero
    # shuffle exchanges beyond dedup's window shuffle
    base = _plan(spark, "pipe_dedup_w1")
    routed = _plan(spark, "pipe_route_fanout")
    assert _n_exchanges(routed) == _n_exchanges(base)


def test_text_repetition_two_combined_shuffles(spark):
    # batch path (operators/repetition.py): explode -> groupBy(id, gram)
    # -> groupBy(id), exactly two exchanges, both behind partial hash
    # aggregates (map-side combine) so shuffle volume is the per-doc
    # distinct-gram footprint, never the raw exploded gram stream
    plan = _plan(spark, "text_repetition")
    assert _n_exchanges(plan) == 2, plan[:2000]
    assert plan.count("partial_") >= 2, plan[:2000]


def test_domain_cap_single_shuffle(spark):
    # one hash partition on the domain key (window), no global sort
    plan = _plan(spark, "sample_domain_cap")
    assert _n_exchanges(plan) == 1, plan[:2000]


def test_q5_dims_broadcast_and_filter_pushdown(spark):
    # the 6-table snowflake must resolve to broadcast joins on the dim
    # chain with the region predicate pushed into its scan — a shuffle
    # join against a 5-row region table means the optimizer story broke
    plan = _plan(spark, "tpch_q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "PushedFilters" in plan and "EqualTo(r_name,ASIA)" in plan, \
        plan[:2000]


def test_q4_semi_join_no_duplication(spark):
    plan = _plan(spark, "tpch_q4_priority_semijoin")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # both date filters reach the scans
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_parts_unsold_is_anti_join(spark):
    plan = _plan(spark, "tpch_parts_unsold_2001")
    assert "LeftAnti" in plan
    # the anti side is pruned to keys before the join: lineitem scan
    # must not read quantities/prices
    li_reads = [ln for ln in plan.splitlines()
                if "ReadSchema" in ln and "l_orderkey" in ln]
    assert li_reads and all("l_extendedprice" not in ln for ln in li_reads)


def test_q19_broadcasts_part_and_prunes(spark):
    plan = _plan(spark, "tpch_q19_or_predicates")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # lineitem scan reads only the join/predicate/measure columns
    li_reads = [ln for ln in plan.splitlines()
                if "ReadSchema" in ln and "l_partkey" in ln]
    assert li_reads and all("l_shipdate" not in ln for ln in li_reads)


def test_budget_head_has_no_global_window(spark):
    # the distributed prefix sum must not degenerate into a
    # single-partition window
    plan = _plan(spark, "docs_token_budget")
    assert "Window" not in plan
    assert "MapInPandas" in plan


def test_bpe_topk_is_take_ordered(spark):
    # top-k must plan as per-partition heaps + driver k-merge, never a
    # global sort of the whole pair vocabulary
    plan = _plan(spark, "text_bpe_pairs")
    assert "TakeOrderedAndProject" in plan
    assert _n_exchanges(plan) <= 1  # the pair-count agg only


def test_multiline_groupby_reuses_window_clustering(spark):
    # one per-file window exchange (+ _spread's under-split-input
    # repartition, a no-op on real multi-file tables); the re-join
    # groupBy must NOT add a third — partial+final aggregate sit
    # directly on the window's (file) clustering via the subset rule
    plan = _plan(spark, "pipe_multiline")
    assert _n_exchanges(plan) <= 2
    # tree prints parents above children: both aggregate phases must
    # sit ABOVE (= downstream of) every exchange — nothing reshuffles
    # between the window and the final aggregate
    lines = plan.splitlines()
    last_agg = max(i for i, l in enumerate(lines[:40])
                   if "HashAggregate" in l)
    first_exch = min(i for i, l in enumerate(lines[:40])
                     if "Exchange" in l)
    assert last_agg < first_exch


def test_surprisal_vocab_join_no_extra_shuffle(spark):
    # vocab agg + token join + per-doc agg; the scalar total must ride
    # a broadcast (never a single-partition exchange of the stream)
    plan = _plan(spark, "text_surprisal")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row total crossJoin
    assert _n_exchanges(plan) <= 4


def test_skew_join_hot_side_broadcasts(spark):
    plan = _plan(spark, "events_skew_join")
    assert "BroadcastHashJoin" in plan


def test_rfm_single_aggregation(spark):
    # one groupBy over orders; the binning is pure projection work
    plan = _plan(spark, "dim_rfm_segments")
    assert _n_exchanges(plan) <= 1
    assert "Window" not in plan


def test_curriculum_no_single_partition_window(spark):
    # the global rank must come from the two-phase prefix machinery,
    # never a row_number() window with empty partitionBy
    plan = _plan(spark, "sample_curriculum")
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_bm25_query_terms_broadcast(spark):
    # the query-term table must broadcast and non-query terms must die
    # pre-shuffle; the stats scalar rides a broadcast nested loop
    plan = _plan(spark, "text_bm25_topk")
    assert "BroadcastHashJoin" in plan
    assert _n_exchanges(plan) <= 5


def test_kmeans_centroids_broadcast(spark):
    # centroids (k x dim rows) must broadcast in every round — the
    # point frame never shuffles for the assignment join
    plan = _plan(spark, "sim_kmeans")
    assert plan.count("BroadcastHashJoin") >= 2
    assert _n_exchanges(plan) <= 6


def test_countmin_sketch_probe_broadcasts(spark):
    # the d x w sketch table broadcasts to the probe side
    plan = _plan(spark, "agg_countmin_audit")
    assert "BroadcastHashJoin" in plan
    assert _n_exchanges(plan) <= 3


def test_prefix_dedup_single_sort(spark):
    # rank window + running-prefix window share one (conv_id) shuffle;
    # + the final group agg + the fixture's _spread repartition (a
    # no-op on real multi-file tables) = 3
    plan = _plan(spark, "pipe_prefix_dedup")
    assert _n_exchanges(plan) <= 3
    # the two windows must NOT each get a sort+exchange: exactly one
    # hashpartitioning(conv_id) in the executed tree
    ex = _plan_exec(spark, "pipe_prefix_dedup")
    assert ex.count("Exchange hashpartitioning(conv_id") == 1


def test_export_e2e_chain_shuffles_bounded(spark):
    # filter -> dedup window -> split -> manifest: the only wide ops
    # are the md5(text) window and the final (split, shard) aggregate
    plan = _plan(spark, "docs_export_e2e")
    assert _n_exchanges(plan) <= 3
    assert "SinglePartition" not in plan


def test_kmv_sketch_is_take_ordered(spark):
    # min-k must be TakeOrderedAndProject (per-partition heaps), not
    # a global sort; audit joins two single-row aggregates.
    plan = _plan(spark, "agg_kmv_audit")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_eval_set(spark):
    # corpus vectors must NOT shuffle: the eval side rides a
    # broadcast into a nested-loop kernel, like hard_negatives.
    plan = _plan(spark, "sim_decontaminate")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_entity_matches_one_block_join(spark):
    # block self-join + class agg: the pair expansion happens in ONE
    # equi-join (however Spark shuffles or broadcasts the sides —
    # never a cartesian).
    plan = _plan(spark, "dim_entity_matches")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_keyness_topk_is_take_ordered(spark):
    # global top-20 must be a distributed heap (TakeOrderedAndProject),
    # never a single-partition global Sort; shuffles: the token-count
    # agg only (the 1-row totals ride a broadcast nested loop).
    plan = _plan(spark, "text_keyness")
    assert "TakeOrderedAndProject" in plan
    assert _n_exchanges(plan) <= 1, plan


def test_source_ablation_totals_broadcast(spark):
    # per-source agg joined to the 1-row corpus totals: the totals
    # must broadcast; no sort-merge machinery for a 20-row join.
    plan = _plan(spark, "docs_source_ablation")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_drift_batched_single_union_shuffle(spark):
    # batched LCS = union-tag both periods, ONE hash exchange on the
    # key into MapInPandas, plus the decile rollup agg — never a
    # join-based pairing of the two sides, never per-key cogroup
    # round-trips (measured 14x slower at sf0.1).
    plan = _plan(spark, "events_user_drift")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert _n_exchanges(plan) <= 2, plan


def test_kappa_single_wide_pass(spark):
    # the only data-sized shuffle is the (a, b) confusion-cell agg;
    # everything downstream operates on <=25 rows.
    plan = _plan(spark, "dq_label_kappa")
    assert "SortMergeJoin" not in plan


def test_sixth_session_plan_shapes(spark):
    # centroid affinity: pair + norm joins all broadcast, <=3 real
    # exchanges (points groupBy, per-centroid aggs) — a lost broadcast
    # turns the pair expansion into a sort-merge join
    plan = _plan(spark, "sim_source_affinity")
    assert "SortMergeJoin" not in plan
    assert _n_exchanges(plan) <= 3
    # forecast backtest: lag sides read the PINNED collapsed series —
    # one exchange, no re-aggregation of events per lag side
    plan = _plan(spark, "events_forecast_backtest")
    assert _n_exchanges(plan) <= 1
    # rate-limit fold: one shuffle to collect per-key series
    plan = _plan(spark, "events_rate_limit")
    assert _n_exchanges(plan) <= 1
    # windowed attribution: one per-user window sort + final rollup
    plan = _plan(spark, "events_attribution_windowed")
    assert _n_exchanges(plan) <= 2
    assert "SortMergeJoin" not in plan


def test_auc_pairs_on_collapsed_rows(spark):
    # the cumulative walk must sit ABOVE the (group, score) collapse:
    # exactly the groupBy + window exchanges, and no join at all
    plan = _plan(spark, "dq_score_auc")
    assert _n_exchanges(plan) <= 2
    assert "Join" not in plan.replace("BroadcastNestedLoopJoin", "") \
        or "SortMergeJoin" not in plan


def test_cohort_ltv_single_scan(spark):
    # cohort via same-key window min: the events scan appears ONCE
    # (groupBy+join-back would scan twice). Count detail headers —
    # the formatted output repeats each node name in the tree line.
    plan = _plan(spark, "events_cohort_ltv")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_seventh_session_plan_shapes(spark):
    # skyline: the dominance pass must be the single-sort rewrite —
    # no quadratic inequality join anywhere in the plan
    plan = _plan(spark, "docs_pareto_front")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # Poisson bootstrap: the B-fold replicate explode stays map-side —
    # the only hash exchanges are the per-replicate aggregation and
    # the scalar collects (never an exchange of the exploded rows
    # keyed by anything finer than the replicate id)
    plan = _plan(spark, "events_bootstrap_ci")
    tree = plan.split("\n\n")[0].splitlines()
    gen_lines = [i for i, ln in enumerate(tree) if "Generate" in ln]
    assert len(gen_lines) == 1 and "explode" in plan
    # walking UP from the Generate (towards the root), the partial
    # HashAggregate must appear before any hash Exchange — i.e. the
    # exploded rows aggregate inside the map stage and only B
    # replicate rows cross the shuffle
    above = tree[:gen_lines[0]][::-1]
    first_agg = next(i for i, ln in enumerate(above)
                     if "HashAggregate" in ln)
    first_ex = next((i for i, ln in enumerate(above)
                     if "Exchange hash" in ln), len(above))
    assert first_agg < first_ex

    # join-size prediction never shuffles fact rows — only the two
    # collapsed per-key count tables meet in a join
    plan = _plan(spark, "agg_join_cardinality")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan

    # subsequence mining: the three self-join sides come from ONE
    # localCheckpointed stats table (scan appears, raw events do not
    # feed three aggregations)
    plan = _plan(spark, "events_subseq_patterns")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 3  # checkpointed reuse


def test_changepoint_windowless_argmax(spark):
    # one sort per key for the cumulative window, then a plain
    # aggregate — no join-back, no second window
    plan = _plan(spark, "events_changepoint")
    assert "Join" not in plan
    # two exchanges total: the daily-rollup groupBy and the per-key
    # window sort; both window specs share one sort, and the final
    # argmax groupBy REUSES the window's partitioning (SortAggregate
    # directly above Window, no third exchange)
    assert _n_exchanges(plan) == 2, plan[:1500]


def test_inference_family_plan_shapes(spark):
    # rank-free tests: the prefix-sum window must run over the
    # COLLAPSED value table (a groupBy aggregate below the Window),
    # and nothing in the family may nest a quadratic join
    for name in ("events_mannwhitney", "events_ks_test"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        tree = plan.split("\n\n")[0].splitlines()
        win = next(i for i, ln in enumerate(tree) if "Window" in ln)
        assert any("HashAggregate" in ln for ln in tree[win:]), name
        assert _n_exchanges(plan) <= 4, name

    plan = _plan(spark, "events_chi2_daypart")
    assert "CartesianProduct" not in plan

    # SMD balance: the long-form expand aggregates before any join —
    # only the tiny (covariate, arm) table reaches the a x b join
    plan = _plan(spark, "events_covariate_balance")
    assert "CartesianProduct" not in plan
    assert _n_exchanges(plan) <= 4

    # cross-correlation: ONE join carries all lags (the explode
    # probe), not one join per lag
    plan = _plan(spark, "events_crosscorr")
    tree = plan.split("\n\n")[0].splitlines()
    gens = [ln for ln in tree if "Generate" in ln]
    assert len(gens) >= 1  # the lag-probe explode exists
    joins = [ln for ln in tree
             if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
             or "BroadcastHashJoin" in ln]
    assert len(joins) <= 4, plan[:1500]
