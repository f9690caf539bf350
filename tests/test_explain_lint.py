"""Explain-lint gate (VERDICT r04 next-round #4): every registry query
is EXECUTED at sf0.001 and its AQE-final physical plan is linted —

1. no ``CartesianProduct`` anywhere (a cartesian that sneaks into any
   query is a 100 TB outage, full stop);
2. ``BroadcastNestedLoopJoin`` only in the queries that use it BY
   DESIGN (tiny broadcast side: top-k query panels, scalar-aggregate
   cross joins, histogram bound tuples) — listed in BNLJ_BY_DESIGN;
3. no SortMergeJoin keyed on nation/region — sub-megabyte dimensions
   must broadcast;
4. at most SCAN_BUDGET[query][table] FileScans of each table in the
   EXECUTED plan (default 1): a query whose final plan re-scans a
   table it could share (exchange reuse / persisted intermediate)
   pays N corpus scans at 100 TB.  The executed plan — not the static
   one — is what's linted, because AQE's exchange reuse only
   materializes at runtime: the r04 ``tfidf_top_terms`` double corpus
   scan (2 FileScans, no ReusedExchange — VERDICT r04 'What's wrong'
   #1) was invisible in the static plan and is exactly the class this
   gate now catches before it ships.  That query's budget is pinned
   to {documents: 1} by the default.

Budgets above 1 are the audited exceptions: self-joins (range/as-of/
dedup-pairs/set-similarity), set operations, TPC-H correlated
subqueries (q11/q15/q17/q18/q21/q22), and scalar-aggregate side
branches (histogram bounds, centroid panels).  Lowering an entry is
an improvement; raising one needs the same justification in a review.
"""

from __future__ import annotations

import re

import pytest

from distributedmapreduce_spark.plans.core import registry

SF = "/root/testdata/sf0.001"

# queries where a BroadcastNestedLoopJoin is the intended plan: the
# broadcast side is O(1)-bounded (query panels, scalar aggregates,
# histogram/decile boundary tuples, centroid tables), never data-sized
BNLJ_BY_DESIGN = {
    "ab_test_cuped",  # midpoint instant + theta row: scalar broadcasts
    "abc_inventory_classification",  # revenue-total row: scalar broadcast
    "assoc_rules_lift",  # n_baskets universe count: scalar broadcast
    "burrows_delta_sources",  # top-50 vocab x source-totals panel
    "mutual_info_type_hour",  # grand-total row: scalar broadcast
    "quantile_normalize_spend",  # pooled-N scalar: 1-row broadcast
    "frequent_itempairs",  # n_orders universe count: scalar broadcast
    "rfm_user_segments",  # global-max-instant row: scalar broadcast
    "ann_ivf_topk",
    "ann_ivf_topk_portable",
    "ann_lsh_topk",
    "ann_lsh_topk_portable",
    "approx_distinct_hll_portable",  # sketch-state x exact-count scalars
    "approx_distinct_kmv_portable",  # sketch-state x exact-count scalars
    "approx_distinct_linear_portable",
    "benford_first_digit_audit",  # digit-total row: scalar broadcast
    "bloom_semi_join_audit",
    "chi2_independence_audit",  # grand-total row: scalar broadcast
    "churn_training_set",  # cutoff instant: scalar broadcast
    "bm25_search",
    "cosine_topk_bruteforce",
    "curation_pipeline_v3",
    "curation_pipeline_v4",  # 9x9 suffix-cumulative audit theta join
    "dsir_importance_select",  # (T, R) totals row: scalar broadcast
    "decile_lift_gains",  # 9-tuple boundary array: scalar broadcast
    "ddsketch_pow2_quantiles",  # 3-row quantile panel x <=41 buckets
    "event_rate_deviation",
    "heaps_law_vocab_growth",  # 10-row decile panel x bounded lookups
    "rbo_brand_rankings",  # 20-row depth panel x 20-row rank overlap
    "isotonic_calibration",  # bins² minimax triangle: bounded panel
    "sax_weekly_revenue",  # 1-row quartile-breakpoint panel broadcast
    "permutation_test_spend",  # 1-row observed-statistic broadcast
    # calendar-bounded day-pair theta join (~2.4k-row broadcast) +
    # three 1-row statistic panels
    "mann_kendall_trend",
    "bh_fdr_brand_tests",  # 1-row BH-threshold panel broadcast
    "join_key_skew_profile",
    "keyness_lang_drift",  # vocab-totals row: scalar broadcast
    "kendall_tau_qty_price",  # bounded contingency cells x cells panel
    "mahalanobis_outliers_qty_price",  # 1-row moment panel broadcast
    "kmv_set_intersection",  # <=32-row sketch tables x 1-row scalars
    "knn_classify",
    "ks_pairwise_priorities",  # 5-group totals row: scalar broadcast
    "ks_two_sample_exact",  # (n0, n1) totals row: scalar broadcast
    "lorenz_curve_deciles",  # (n, tv) totals row: scalar broadcast
    "mann_whitney_u_exact",  # (n0, n1) totals row: scalar broadcast
    "user_burstiness_fano",  # global-span row: scalar broadcast
    "weekday_uniformity_chi2",  # grand-total row: scalar broadcast
    "markov_attribution_removal",  # p_full scalar: 1-row x 4 broadcast
    "minhash_recall_audit",  # confusion-count scalars: 1-row broadcasts
    "naive_bayes_lang_predict",  # 5-row lang panel x V/D scalars
    "negative_sampling_pairs",  # (mn, mx) id-ring bounds: scalar broadcast
    "pagerank_event_types",
    "pct_of_parent_rollup",  # global-revenue row: scalar broadcast
    "pmi_bigram_scores",
    "price_decile_assign",
    "price_histogram",
    "psi_feature_drift",  # period-totals row: scalar broadcast
    "target_encode_loo",  # global-mean fallback row: scalar broadcast
    "source_mixture_balance",
    "time_bucket_gapfill",
    "time_bucket_interpolate",
    "tpch_q11_important_part_value",
    "tpch_q22_global_sales_opportunity",
}

# audited FileScan budgets per (query, table) — default is 1 scan per
# table; entries here are the justified exceptions (see module doc)
SCAN_BUDGET: dict[str, dict[str, int]] = {
    "ab_test_cuped": {"events": 2},  # midpoint scalar + per-user build
    "ann_ivf_topk_portable": {"embeddings": 3},
    "attribution_linear_touch": {"events": 2},  # purchase/click self-join
    "ann_lsh_topk": {"embeddings": 2},
    "ann_lsh_topk_portable": {"embeddings": 2},
    "approx_distinct_hll_portable": {"orders": 2},  # sketch + exact branches
    "approx_distinct_kmv_portable": {"orders": 2},  # sketch + exact branches
    "approx_distinct_linear_portable": {"orders": 2},
    "asof_join_forward_tolerance": {"events": 2},
    "asof_join_nearest": {"events": 2},  # purchase/click self-join
    "asof_join_purchase_click": {"events": 2},
    "benford_first_digit_audit": {"orders": 2},  # digit-total branch
    "bloom_semi_join_audit": {"customer": 4},
    "bm25_search": {"documents": 2},  # dl pass + tf pass (aggregates persisted)
    "boilerplate_shingle_score": {"documents": 2},
    "cosine_topk_bruteforce": {"embeddings": 2},
    "dedup_minhash_portable": {"documents": 2},
    # bigram stream + 3-column meta projection (column-pruned)
    "dsir_importance_select": {"documents": 2},
    "dedup_simhash": {"documents": 2},
    "dup_span_detect": {"documents": 2},
    # two-phase boundary-rank selection BY DESIGN: bin-count pass +
    # boundary-row pass (the r06 window-funnel swap)
    "event_value_quantiles_exact": {"events": 2},
    # segmented TWA BY DESIGN: within-bucket lead pass + bucket-summary
    # stitch pass (the r06 window-funnel swap)
    "time_weighted_average": {"events": 2},
    # ordered funnel: one pass per stage BY DESIGN (filter pushed to
    # each scan; later stages join the prior stage's per-user min)
    "funnel_conversion": {"events": 3},
    # dim-stats pass + broadcast-stats map pass
    "embedding_int8_quantize": {"embeddings": 2},
    # first-week aggregate + distinct-activity pass
    "retention_cohorts_weekly": {"events": 2},
    "gopher_quality_flags": {"documents": 2},
    "heavy_hitters_mg": {"documents": 2},  # two-pass MG by design
    "incremental_novelty_exact": {"documents": 2},
    # two passes of the point stream BY DESIGN: the bounded-window
    # sweep recomputes `run` for the peak filter instead of holding a
    # full-partition max window (docstring: the price of bounded state)
    "interval_max_concurrency_segmented": {"events": 3},
    "interval_overlap_join": {"events": 2},  # click/view interval self-join
    "knn_classify": {"embeddings": 2},
    "lm_bigram_surprisal": {"documents": 2},  # model build + scoring pass
    # moment pass + scoring pass BY DESIGN (1-row panel broadcast back)
    "mahalanobis_outliers_qty_price": {"lineitem": 2},
    # one scan per ranking metric BY DESIGN (revenue vs distinct-order
    # count aggregate to different shapes; both top-20 panels)
    "rbo_brand_rankings": {"lineitem": 2},
    "mv_incremental_refresh": {"events": 2},
    # id-ring bounds scalar + anchor side + negative side BY DESIGN
    # (bounds scan is vec_id-pruned; the join sides are the operator)
    "negative_sampling_pairs": {"embeddings": 3},
    "price_decile_assign": {"orders": 2},
    "price_histogram": {"orders": 2},
    "range_join_event_pairs": {"events": 2},
    "rfm_user_segments": {"events": 2},  # global-max scalar + per-user build
    "referential_integrity_audit": {"orders": 2, "lineitem": 2},
    "sequence_packing": {"documents": 2},
    "setop_except": {"orders": 2},
    "setop_except_all": {"orders": 2},
    "setop_intersect": {"orders": 2},
    "setop_intersect_all": {"orders": 2},
    "setop_union_distinct": {"orders": 2},
    "skew_salted_join_counts": {"events": 2},
    "source_mixture_balance": {"documents": 2},
    "stream_dedup_counts": {"events": 2},
    "stream_join_click_purchase": {"events": 2},
    "temporal_scd2_lookup": {"events": 2},
    "tpch_q11_important_part_value": {"lineitem": 2},
    "weighted_median_price": {"lineitem": 2},  # total-weight scalar branch
    # same two-phase bucket discipline as weighted_median_price:
    # totals pass + boundary-bucket pass
    "weighted_percentiles_price": {"lineitem": 2},
    # stats pass (present-value median histogram) + repair pass BY
    # DESIGN — the mahalanobis/price_decile two-scan shape
    "impute_group_median": {"lineitem": 2},
    "tpch_q15_top_supplier": {"lineitem": 2},
    "tpch_q17_small_quantity_revenue": {"lineitem": 2},
    "tpch_q18_large_volume_customer": {"lineitem": 2},
    "tpch_q21_suppliers_who_kept_waiting": {"lineitem": 3},
    "tpch_q22_global_sales_opportunity": {"customer": 2},
    "tpch_q8_market_share": {"nation": 2},
}

_SCAN_RE = re.compile(r"FileScan \w+ .*?file:[^\]]*?/(\w+)\.parquet")
_SMJ_DIM_RE = re.compile(r"SortMergeJoin \[[^\]]*(?:n_nationkey|r_regionkey)")

# --- rule 5 (VERDICT r05 next-round #2): no low-parallelism window
# over corpus-scaled input.  The r05 shapes this kills: a global
# rank/row_number window (empty partition spec) whose input is an
# ENTITY-cardinality table (decile_lift_gains ranked every user
# through one task), and a window partitioned only by a KNOWN-tiny
# column over raw rows (weighted_median_price cumsum'd all of lineitem
# inside 3 l_returnflag partitions).  Both are invisible to row-count
# caps at the lint SF (15 purchase users at sf0.001), so the rule is
# STRUCTURAL, on the executed physical plan via py4j: a Window is
# ENGAGED when its partition spec is empty or draws only on columns
# from the low-cardinality denylist; an engaged Window fails if its
# input subtree reaches a FileScan with no aggregate in between, or
# the first aggregate below is keyed on an entity-id/vocab column
# (user_id, doc_id, orderkey, word, ...) — i.e. the window's input
# grows with the corpus.  Broadcast sides, cached intermediates, and
# reused exchanges are bounded by construction and end the walk.
# Safe-by-value inputs (bucket-totals tables keyed on range buckets,
# decile tables, scalar panels) pass untouched.
_ENTITY_KEYS = {
    "user_id", "doc_id", "emb_id", "event_id", "session_id",
    "o_orderkey", "l_orderkey", "o_custkey", "c_custkey",
    "s_suppkey", "p_partkey", "l_partkey", "l_suppkey",
    "ps_partkey", "ps_suppkey",
    "word", "token", "term", "shingle", "fp",
}
_LOW_CARD_PARTS = {
    "flag", "l_returnflag", "l_linestatus", "l_shipmode",
    "l_shipinstruct", "event_type", "etype", "o_orderstatus",
    "status", "o_orderpriority", "priority", "c_mktsegment",
    "segment", "r_regionkey", "n_nationkey", "lang", "source",
    "p_brand", "p_container", "decile",
}
_AGG_CLASSES = {
    "HashAggregateExec", "ObjectHashAggregateExec", "SortAggregateExec",
}
_SCAN_CLASSES = {
    "FileSourceScanExec", "RowDataSourceScanExec", "BatchScanExec",
}
_BOUNDED_STOP = {  # bounded by construction: stop the walk, it's fine
    "BroadcastExchangeExec", "BroadcastQueryStageExec",
    "ReusedExchangeExec", "InMemoryTableScanExec",
    # map-side rank-limit pruning: a Partial WindowGroupLimit bounds
    # the final window's input to k rows per (group x map task) —
    # the same merge shape as TakeOrderedAndProject, scale-safe
    "WindowGroupLimitExec",
}
_NAMEREF_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")
_AGGKEYS_RE = re.compile(r"keys=\[([^\]]*)\]")

# audited exceptions: parity fixtures whose POINT is the naive form,
# kept as the documented contrast to their scale-safe twins
WINDOW_FUNNEL_BY_DESIGN: dict[str, str] = {
    "price_decile_assign": "9-row boundary rank over orders; docstring"
    " documents the bucketed two-phase swap at extreme n",
    "interval_max_concurrency": "naive per-type sweep kept as the"
    " documented contrast; interval_max_concurrency_segmented IS the"
    " bounded-window 100 TB shape, in-registry and hash-green",
    "window_rank_battery": "reference-parity fixture for the"
    " rank/dense_rank/percent_rank/cume_dist surface — the naive"
    " per-type window IS the semantics under test",
    "window_rank_dense_ntile": "reference-parity fixture for"
    " rank/dense_rank/ntile over the 100-row supplier dim",
}


def _jchildren(node):
    out = [node.children().apply(i) for i in range(node.children().size())]
    cn = node.getClass().getSimpleName()
    if cn == "AdaptiveSparkPlanExec":
        out.append(node.executedPlan())
    elif "QueryStage" in cn:
        out.append(node.plan())
    return out


def _window_input_violations(node) -> list[str]:
    cn = node.getClass().getSimpleName()
    if cn in _BOUNDED_STOP:
        return []
    if cn in _AGG_CLASSES:
        m = _AGGKEYS_RE.search(node.simpleString(200))
        names = set(_NAMEREF_RE.findall(m.group(1))) if m else set()
        ent = sorted(names & _ENTITY_KEYS)
        return (
            [f"first aggregate below is keyed on entity column(s) {ent}"]
            if ent
            else []
        )
    if cn in _SCAN_CLASSES:
        return ["raw FileScan with no aggregate below the window"]
    out: list[str] = []
    for c in _jchildren(node):
        out += _window_input_violations(c)
    return out


def _window_funnels(jplan) -> list[str]:
    bad: list[str] = []

    def visit(node):
        cn = node.getClass().getSimpleName()
        if cn in _BOUNDED_STOP:
            return
        if cn == "WindowExec":
            ps = node.partitionSpec()
            pnames: set[str] = set()
            for i in range(ps.size()):
                pnames |= set(_NAMEREF_RE.findall(ps.apply(i).toString()))
            engaged = ps.isEmpty() or (
                bool(pnames) and pnames <= _LOW_CARD_PARTS
            )
            if engaged:
                part = sorted(pnames) if pnames else "(global)"
                for child in _jchildren(node):
                    for v in _window_input_violations(child):
                        bad.append(f"Window partitioned by {part}: {v}")
        for c in _jchildren(node):
            visit(c)

    visit(jplan)
    return bad


def _name_col(line: str) -> int:
    """Column where the node name starts in Spark's tree rendering
    (strip the ':  +- ' glyph prefix)."""
    return len(line) - len(line.lstrip(" :+-*("))


def _executed_final_plan(spark, name: str) -> tuple[str, object]:
    df = registry()[name].fn(spark, SF)
    df.collect()  # materialize THIS QueryExecution so AQE finalizes
    jplan = df._jdf.queryExecution().executedPlan()
    s = jplan.toString()
    # keep only the AQE-final section; the echoed pre-adaptive plan
    # would double-count scans that runtime exchange reuse eliminated
    s = s.split("== Initial Plan ==")[0]
    # drop cached-plan ORIGIN subtrees: an InMemoryRelation prints the
    # full lineage that built the cache, including FileScans that do
    # NOT execute — counting them would flag persisted intermediates
    # (e.g. the BPE vocabulary) as phantom re-scans
    out, skip_deeper_than = [], None
    for line in s.splitlines():
        col = _name_col(line)
        if skip_deeper_than is not None:
            if line.strip() and col > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = col
            continue
        out.append(line)
    return "\n".join(out), jplan


@pytest.mark.parametrize("name", sorted(registry()))
def test_executed_plan_lint(spark, name):
    plan, jplan = _executed_final_plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in BNLJ_BY_DESIGN:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned BroadcastNestedLoopJoin"
        )
    assert not _SMJ_DIM_RE.search(plan), (
        f"{name}: nation/region joined via SortMergeJoin (must broadcast)"
    )
    scans: dict[str, int] = {}
    for m in _SCAN_RE.finditer(plan):
        scans[m.group(1)] = scans.get(m.group(1), 0) + 1
    budget = SCAN_BUDGET.get(name, {})
    over = {
        t: c for t, c in scans.items() if c > budget.get(t, 1)
    }
    assert not over, (
        f"{name}: FileScan count exceeds audited budget: {over} "
        f"(budget {budget or 'default 1/table'}) — a new re-scan of a "
        f"shareable table; fix the plan or justify a budget bump"
    )
    if name not in WINDOW_FUNNEL_BY_DESIGN:
        funnels = _window_funnels(jplan)
        assert not funnels, (
            f"{name}: low-parallelism window over corpus-scaled input "
            f"(one/few tasks hold the table at 100 TB): {funnels}; use "
            f"the two-phase bucketed rank/cumsum discipline "
            f"(keyed_prefix_sum / _budget_prefix / boundary tuples) or "
            f"justify a WINDOW_FUNNEL_BY_DESIGN entry"
        )
