"""Physical-plan regression tests (SURVEY.md §7.6 scale notes): the
optimizations the engine depends on must actually appear in the plans
— predicate pushdown + column pruning at the parquet scan, broadcast
joins for small dimensions, no cartesian products in the range join."""

from __future__ import annotations

import re

import pytest

from distributedmapreduce_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _formatted_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_scan_pushdown_and_pruning(spark):
    plan = _formatted_plan(spark, "scan_filter_project")
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)" in plan
    # only the referenced columns reach the scan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,"
        "l_quantity:double,l_extendedprice:double,l_shipdate" in plan
    )
    assert "l_comment" not in plan and "l_tax" not in plan


def test_star_join_broadcasts_dimensions(spark):
    plan = _formatted_plan(spark, "join_broadcast_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_selective_filter_pushes_through_join(spark):
    plan = _formatted_plan(spark, "q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_range_join_is_not_cartesian(spark):
    plan = _formatted_plan(spark, "range_join_event_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_broadcasts_query_side(spark):
    plan = _formatted_plan(spark, "cosine_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan  # tiny query side, by design


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q5_local_supplier_volume",
        "tpch_q7_volume_shipping",
        "tpch_q10_returned_items",
        "tpch_q14_promo_revenue",
    ],
)
def test_tpch_dimensions_broadcast(spark, name):
    """nation/region/part/supplier must broadcast, never shuffle."""
    plan = _formatted_plan(spark, name)
    assert "BroadcastHashJoin" in plan


def test_tpch_q6_no_join_no_wide_scan(spark):
    """Q6 is a pure scan+agg: predicates pushed, only 4 columns read."""
    plan = _formatted_plan(spark, "tpch_q6_forecast_revenue")
    assert "Join" not in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    assert "l_returnflag" not in plan and "l_tax" not in plan


def test_tpch_q4_semi_join(spark):
    plan = _formatted_plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan


def test_tpch_q22_anti_join(spark):
    plan = _formatted_plan(spark, "tpch_q22_global_sales_opportunity")
    assert "LeftAnti" in plan


def test_ann_ivf_structure_and_recall(spark):
    """IVF returns exactly top-5 per query and finds most of the true
    neighbors at nprobe=4/16."""
    ivf = QUERIES["ann_ivf_topk"](spark, SF).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in per_q.values())
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["cosine_topk_bruteforce"](spark, SF).collect()
    }
    iv = {(r.query_id, r.neighbor_id) for r in ivf}
    assert len(bf & iv) / len(bf) >= 0.5


def test_training_pipeline_single_scan(spark):
    """The composed curation pipeline must read the corpus ONCE —
    quality gates, language filter and the dedup-keeper window all
    hang off a single parquet scan."""
    plan = _formatted_plan(spark, "training_data_pipeline")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_dedup_exact_single_scan(spark):
    plan = _formatted_plan(spark, "dedup_exact")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_minhash_no_cartesian(spark):
    plan = _formatted_plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_profile_columns_single_scan(spark):
    """Profiling 3 columns must NOT be 3 scans (the UNION ALL trap) —
    the stacked-struct formulation reads the table once."""
    plan = _formatted_plan(spark, "profile_columns")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_decontamination_single_scan_no_self_join(spark):
    """Decontamination groups shingles ONCE (posting-list formulation):
    one corpus scan, no join operator at all, no cartesian."""
    plan = _formatted_plan(spark, "decontaminate_ngram_overlap")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_distributed_prefix_sum(spark):
    """Packing's cumulative offset must be the bucketed keyed prefix
    sum: the corpus-sized window partitions by bucket (parallel), and
    the only single-partition exchange is the TINY bucket-totals
    table (<= n_rows/bucket_width rows) — never the corpus itself."""
    plan = _formatted_plan(spark, "sequence_packing")
    assert "hashpartitioning(__kps_bucket" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_q19_single_join_no_union(spark):
    """The disjunctive predicate must stay one broadcast equi-join —
    not a UNION of three filtered scans, not a cartesian."""
    plan = _formatted_plan(spark, "tpch_q19_disjunctive_revenue")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "Union" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q2_correlated_min_as_window(spark):
    """Q2's correlated min-cost subquery must compile to a partition
    window over the joined costs, never a re-executed subquery or a
    cartesian."""
    plan = _formatted_plan(spark, "tpch_q2_min_cost_supplier")
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark):
    plan = _formatted_plan(spark, "tpch_q16_supplier_part_count")
    assert "LeftAnti" in plan


def test_q20_nested_in_as_semi_joins(spark):
    plan = _formatted_plan(spark, "tpch_q20_excess_suppliers")
    assert plan.count("LeftSemi") >= 2
    assert "CartesianProduct" not in plan


def test_token_budget_select_no_corpus_global_window(spark):
    """The budget cumsum must run over the TINY score-bucket table
    (and the boundary-bucket window partitions by bkt) — the corpus
    itself never funnels through a single-partition sort."""
    plan = _formatted_plan(spark, "token_budget_select")
    assert "hashpartitioning(bkt" in plan
    # the only single-partition exchange is the <=1024-row bucket table
    assert plan.count("Exchange SinglePartition") <= 1


def test_boilerplate_no_self_join_no_cartesian(spark):
    """Boilerplate df flag joins back on the shingle string (posting-
    list bounded) — no cartesian and no broadcast-nested-loop."""
    plan = _formatted_plan(spark, "boilerplate_shingle_score")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_map_side_only(spark):
    """Chunk splitting is tokenize + explode + slice: zero shuffles."""
    plan = _formatted_plan(spark, "doc_chunk_overlap")
    assert "Exchange" not in plan


def test_scd2_single_shuffle(spark):
    """Both SCD2 windows share one (user_id) hash partitioning."""
    plan = _formatted_plan(spark, "scd2_user_tier_history")
    assert "hashpartitioning(user_id" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_corr_matrix_single_scan(spark):
    """The correlation matrix is ONE sufficient-statistics aggregate —
    a per-pair union would prune each branch's aggregate and scan
    lineitem once per pair (6x)."""
    plan = _formatted_plan(spark, "lineitem_corr_matrix")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_profile_single_scan(spark):
    """Column profiling carries all per-column stats in one aggregate
    row — one scan regardless of column count."""
    plan = _formatted_plan(spark, "table_profile_orders")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_stratified_portable_map_only(spark):
    """Hash-threshold sampling is map-only: no exchange at all."""
    plan = _formatted_plan(spark, "stratified_sample_portable")
    assert "Exchange" not in plan


def test_span_dedup_no_cartesian(spark):
    """Span census joins counts back by hash key — never a pair join."""
    plan = _formatted_plan(spark, "dup_span_detect")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_redact_is_map_only(spark):
    """Compliance pass: pure per-row expression work — no exchange of
    any kind may appear (one codegen span over the scan)."""
    plan = _formatted_plan(spark, "pii_detect_redact")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rolling_spend_single_user_exchange(spark):
    """Trailing RANGE window: exactly one hashpartitioning exchange,
    keyed on user_id — never a single-partition funnel."""
    plan = _formatted_plan(spark, "rolling_7d_user_spend")
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
    assert "SinglePartition" not in plan
    assert plan.count("hashpartitioning(") == 1


def test_decile_gains_no_entity_rank_funnel(spark):
    """r06 swap pinned statically too (the executed-plan lint is the
    primary gate): the per-user table is never globally ranked — any
    empty-partition window in this plan sits above a bin/decile
    aggregate, and the only broadcast of user-derived data is the
    9-tuple bounds array."""
    plan = _formatted_plan(spark, "decile_lift_gains")
    # no Sort of user rows under an Exchange SinglePartition: every
    # SinglePartition exchange must sit above an aggregate keyed on
    # a value-bounded bin/decile column, not user_id
    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.end():]
        assert "user_id" not in tail.split("Exchange", 1)[0].split(
            "Scan parquet", 1
        )[0] or "HashAggregate" in tail.split("Exchange", 1)[0]


def test_weighted_median_window_is_bin_scoped(spark):
    """The ordered cumsum window must be partitioned by (flag, bkt) —
    never by flag alone over raw rows."""
    plan = _formatted_plan(spark, "weighted_median_price")
    assert re.search(
        r"windowspecdefinition\(flag#\d+, bkt#\d+", plan
    ), "cumsum window lost its bin partition key"


def test_quantile_normalize_no_global_sort_one_match_join(spark):
    """The QN rank machinery must never plan a global sort or a
    cartesian: ranks come from band-partitioned windows, and the
    rank→value lookup is an equi-join on rank CELLS (plus the 1-row
    pooled-N broadcast, which is the only BNLJ)."""
    plan = _formatted_plan(spark, "quantile_normalize_spend")
    assert "CartesianProduct" not in plan
    # BNLJ only for the 1-row pooled-count scalar (the static plan
    # prints it once per consuming branch before AQE exchange reuse;
    # the executed-plan lint allowlists the same node)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    # the interval lookup is an EQUI join keyed on the rank cell
    assert re.search(r"keys \[\d+\]: \[cell", plan)


def test_skyline_no_dominance_self_join(spark):
    """The skyline must be the sort-based formulation: no join between
    two corpus-sized sides (the naive dominance anti-join is O(n²))
    and no empty-partition window over the raw orders scan — the only
    unpartitioned window runs over the tiny band-total table."""
    plan = _formatted_plan(spark, "skyline_orders_pareto")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_naive_bayes_single_corpus_scan(spark):
    """NB trains and scores off ONE documents FileScan — model,
    priors, lengths and the scoring join all reuse the persisted
    (doc, lang, word) aggregate."""
    plan = _formatted_plan(spark, "naive_bayes_lang_predict")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
