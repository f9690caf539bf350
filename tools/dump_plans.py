"""Regenerate EXPLAIN.md: formatted physical plans for the flagship
queries, with the property each plan is meant to exhibit.  Usage:

    python3 tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedmapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

SHOWCASE = [
    (
        "scan_filter_project",
        "predicate pushdown + column pruning: PushedFilters carries both "
        "predicates, ReadSchema only the projected columns",
    ),
    (
        "tpch_q6_forecast_revenue",
        "pure scan+aggregate: no join, no wide scan, filters at the source",
    ),
    (
        "tpch_q5_local_supplier_volume",
        "6-table snowflake: every dimension BroadcastHashJoin, zero "
        "SortMergeJoin below the final aggregate",
    ),
    (
        "range_join_event_pairs",
        "bucketized range join: equi-join on time buckets, no "
        "CartesianProduct / BroadcastNestedLoopJoin",
    ),
    (
        "training_data_pipeline",
        "composed curation pipeline: ONE parquet scan feeds quality "
        "gates, language filter and the dedup-keeper window",
    ),
    (
        "dedup_minhash_lsh",
        "LSH near-dup: no self-join of the signature subtree; candidates "
        "from band-bucket collect_list; no cartesian anywhere",
    ),
    (
        "profile_columns",
        "3-column profile in ONE scan (stacked struct explode, not "
        "UNION ALL)",
    ),
    (
        "token_budget_select",
        "budget cumsum over the 1024-row bucket table, per-doc window "
        "only on the boundary bucket — no corpus-wide global sort",
    ),
    (
        "time_bucket_gapfill",
        "zero-filled grid LEFT-joins the aggregated counts with a "
        "broadcast hint on the counts (buildable) side",
    ),
    (
        "lineitem_corr_matrix",
        "d-squared correlation matrix from ONE sufficient-statistics "
        "aggregate — single scan, output rows exploded off the stats row",
    ),
    (
        "price_decile_assign",
        "equi-depth binning: 9 boundary tuples collapsed to a broadcast "
        "array; the assignment pass is map-only (no ntile global sort)",
    ),
    (
        "dup_span_detect",
        "span census: linear explode to tokens/16 hashes, map-side "
        "combinable counts, one hash-keyed join back — no pair join",
    ),
    (
        "stratified_sample_portable",
        "md5-threshold sampling: map-only, zero exchanges",
    ),
    (
        "set_similarity_prefix_join",
        "lossless prefix-filtered similarity join: candidates only from "
        "rarest-first prefix tokens, exact verify on candidates — no "
        "all-pairs join, no cartesian",
    ),
    (
        "bloom_semi_join_audit",
        "Bloom semi-join: bit table + build keys all BroadcastHashJoin, "
        "the orders probe side never shuffles",
    ),
    (
        "window_time_range_rolling",
        "RANGE-frame rolling hour: one exchange on user_id, frame "
        "bounded by width (no unbounded-history buffering)",
    ),
    (
        "tfidf_top_terms",
        "ONE corpus scan (r05): term stream repartitioned by word so "
        "the tf and df branches share a single exchange — AQE's "
        "ReusedExchange serves the df branch at runtime (the static "
        "plan prints two scans; tests/test_explain_lint.py asserts the "
        "EXECUTED plan has one)",
    ),
    (
        "doc_inverted_index",
        "single aggregate phase (r05): doc_freq = size(collect_set), "
        "not a parallel countDistinct that re-plans a second distinct "
        "pass (Expand + 2 aggregates) over the token stream",
    ),
    (
        "multimodal_decode_real",
        "real-codec decode: two Arrow-batched mapInPandas stages "
        "(stdlib encode fixture -> zlib/CRC/filter-reversing decode), "
        "per-asset work only, no shuffle",
    ),
    (
        "embedding_pca_project",
        "rank-1 PCA decomposition: two bounded aggregates (2080-row "
        "Gram + 64-row sums) drive a data-size-independent driver "
        "iteration; the corpus itself sees ONE map-only projection pass",
    ),
    (
        "interval_max_concurrency",
        "sweep-line concurrency: ONE events scan explodes both ±1 "
        "boundary points per row; a single per-type window chain "
        "computes running sum, partition max, and the first peak "
        "instant — no second scan, no self-join",
    ),
    (
        "frequent_itempairs",
        "market-basket self-join: both sides share the persisted "
        "basket table, pairs bounded by basket size; part-count and "
        "universe sides broadcast back onto the pair aggregate",
    ),
    (
        "count_min_heavy_estimates",
        "Count-Min sketch: corpus reduces to vocab in one scan; the "
        "sketch build, top-k panel, and estimate joins all run on "
        "vocab-cardinality tables",
    ),
    (
        "ohlc_resample",
        "hourly OHLC candles: one scan, windows partition on "
        "(type, bucket) so state is bucket-bounded, aggregate "
        "map-side combinable — the continuous-aggregate shape",
    ),
    (
        "interval_overlap_join",
        "interval-overlap join: <=2-cell grid explosion + equi-join "
        "on (user, cell), exact predicate after — no cartesian, no "
        "BroadcastNestedLoopJoin, candidates density-bounded",
    ),
    (
        "session_top_paths",
        "sessionized path mining: ONE user-keyed exchange feeds the "
        "gap windows; paths aggregate map-side; top-k on path "
        "cardinality only",
    ),
    (
        "decile_lift_gains",
        "r06 window-funnel swap: NO global rank window — spend-range "
        "bin table + boundary-bin-only windows select 9 boundary "
        "tuples, assignment is a broadcast array compare (BNLJ on a "
        "1-row bounds array by design)",
    ),
    (
        "weighted_median_price",
        "r06 window-funnel swap: two-phase bucketed cumsum — the "
        "per-row ordered window is partitioned by (flag, price-bin) "
        "and runs ONLY over the boundary bin's rows after a "
        "broadcast semi-join",
    ),
    (
        "time_weighted_average",
        "r06 segmented sweep: lead() partitioned by (type, hour); "
        "bucket summaries stitch boundaries via a window over the "
        "aggregated bucket table only",
    ),
    (
        "rolling_7d_user_spend",
        "trailing RANGE-frame feature: single user-partitioned "
        "window, frame bounded by time not history; no global "
        "exchange",
    ),
    (
        "pii_detect_redact",
        "compliance pass as pure map-side JVM regexp inside one "
        "WholeStageCodegen span: no shuffle, no Python, "
        "doc-cardinality output",
    ),
    (
        "ddsketch_pow2_quantiles",
        "mergeable quantile sketch (r06): ONE orders scan collapses to "
        "a <=41-row map-side-combinable bucket histogram; the readout "
        "walk and quantile panel never touch the corpus again",
    ),
    (
        "file_compaction_plan",
        "compaction planner (r06): ONE documents scan (persisted "
        "4-int projection); bucket-total broadcast, per-doc cumsum "
        "window bounded to (source, id-bucket) — no per-source funnel",
    ),
    (
        "quantile_normalize_spend",
        "exact cross-group quantile normalization (r06 s5): range-"
        "partitioned ranks ($10k bands, windows partitioned by band), "
        "value-histogram inverse-CDF, and a 4096-wide rank-cell "
        "interval join — exactly one match per customer, no all-pairs "
        "band product, no global sort",
    ),
    (
        "skyline_orders_pareto",
        "sort-based 2-D skyline (r06 s5): two-phase band running min "
        "replaces the global single-partition sort; no dominance "
        "self-join, frontier-bounded output",
    ),
    (
        "naive_bayes_lang_predict",
        "multinomial NB train+score (r06 s5): ONE documents FileScan "
        "feeds model, priors, lengths and scores; unseen-word terms "
        "factored out so the scoring join touches only model-present "
        "(word, lang) pairs — no dense doc x vocab grid",
    ),
    (
        "dedup_embedding_cosine",
        "corpus-scaled sign-LSH blocking (r07 default): bucketed "
        "equi-join candidate generation — no cartesian anywhere; "
        "bits-per-band grow with log2(corpus) so the bucket space "
        "tracks the corpus and pair growth stays ~linear",
    ),
    (
        "semdedup_cluster_prune",
        "cluster-blocked semantic dedup (r07 auto-K default): "
        "K ≈ N/128 Lloyd clusters block the pairwise cosine; "
        "within-cluster join only, two-phase argmin keeper, one "
        "persisted vector projection with lifted norms",
    ),
    (
        "dedup_phash_classes",
        "perceptual-hash dedup at the class level (r11): ONE decode "
        "scan aggregates assets into exact-hash classes (bounded by "
        "the distinct-hash population, not the corpus), Hamming "
        "banding runs over distinct hashes only, and both multiplicity "
        "join sides broadcast — the asset-pair quadratic never "
        "materializes",
    ),
    (
        "dedup_audiofp_classes",
        "audio fingerprint dedup (r12): one Arrow-batched PCM decode "
        "panel (mapInPandas, per-asset, no shuffle) feeds builtin "
        "bit-packing; class aggregation + distinct-hash banding keep "
        "the pair stage bounded by the fingerprint population — same "
        "class-pair shape as the image hashes",
    ),
    (
        "dsir_importance_select",
        "DSIR selection (r13): map-side hashed-bigram stream, two "
        "B=512-row model panels broadcast into the scoring join (no "
        "shuffle on the corpus side beyond the doc-bucket aggregate), "
        "scalar totals via 1-row BNLJ, selection as two-phase bounded "
        "TakeOrdered — no corpus-wide window, no driver collect",
    ),
    (
        "multimodal_keyframe_extract",
        "keyframe extraction (r13): per-asset Arrow-batched AVI "
        "decode+diff (mapInPandas, no shuffle), builtin threshold "
        "filter, scene ordinal windowed per asset over <= 8 rows — "
        "the composed stage after scene-cut detection",
    ),
]


def main() -> None:
    spark = get_spark(app_name="dump_plans", cpus=8, driver_memory="8g")
    from distributedmapreduce_spark.plans.registry import QUERIES

    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [
        "# EXPLAIN — physical plans of the flagship queries\n",
        "Generated by `python3 tools/dump_plans.py` at sf0.001 (plan\n"
        "shape is scale-invariant; AQE may further improve at runtime).\n"
        "Each section states the property the plan is graded on;\n"
        "`tests/test_plans.py` pins these properties in CI.\n",
    ]
    for name, prop in SHOWCASE:
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(jmode)
        out.append(f"\n## {name}\n\n**Property:** {prop}\n\n```\n{plan}```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "EXPLAIN.md"), "w") as f:
        f.write("".join(out))
    print("EXPLAIN.md written")


if __name__ == "__main__":
    main()
