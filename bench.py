"""Headline benchmark — run by the driver per round (BENCH_r{N}.json).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the JVM noop sink (no
driver-side collect cost, no result truncation).  Per query the
reported time is the MIN of $SPARK_GRAFT_BENCH_RUNS (default 2) timed
executions — single runs on a shared box carry ±10-30% scheduler/GC
noise on the heavy lines, and min-of-N is the standard steady-state
estimator; the runs count is recorded in the JSON line.  Also records
the reference-workload yardstick: the inverted-index parity job over
the reference's own input.txt (the only same-workload comparison
possible — the reference took "few minutes" on 5 GCP VMs, SURVEY.md
§6).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributedmapreduce_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customer",
    "join_broadcast_nation_revenue",
    "window_topk_orders_per_customer",
    "range_join_event_pairs",
    "sessionization",
    "asof_join_purchase_click",
    "stream_tumbling_counts",
    "doc_word_count",
    "doc_inverted_index",
    "text_quality_scores",
    "dedup_exact",
    "dedup_minhash_lsh",
    "training_data_pipeline",
    "tfidf_top_terms",
    "cosine_topk_bruteforce",
    "ann_ivf_topk",
]

# Tier-2 (VERDICT r05 next-round #7): the most expensive NON-headline
# registry families — iterative graph/tokenizer training, similarity
# self-joins, sketches, pipelines, grouped-map UDFs — timed so the
# new operator families carry a per-round perf-regression signal.
# Timed identically to tier 1 (same warm-up + interleaved min-of-N)
# but reported under "tier2" and NOT folded into the headline total,
# so BENCH_r{N} totals stay comparable across rounds.
TIER2 = [
    "bpe_train_merges",
    "label_propagation_communities",
    "triangle_count_copurchase",
    "set_similarity_prefix_join",
    "heavy_hitters_mg",
    "curation_pipeline_v3",
    "dup_span_detect",
    "interval_max_concurrency",
    "grouped_map_streaks",
    "weighted_median_price",
    # round-6 additions: the new iterative / layout families
    "kmeans_int8_lloyd",
    "kcore_copurchase",
    "bucketed_join_lineitem_orders",
    # round-6 second wave: graph reachability + absorbing-chain MTA
    "bfs_hop_census",
    "markov_attribution_removal",
    # round-6 fourth wave: the basket self-join CF neighbor table and
    # the calendar-bounded pairwise-slope robust trend
    "item_cf_similarity_topk",
    "theil_sen_trend",
    # round-6 fifth wave: the heaviest new analytics-5 operators —
    # corpus NB scoring, the three-discipline quantile normalization,
    # and the rare-part-graph assortativity edge build
    "naive_bayes_lang_predict",
    "quantile_normalize_spend",
    "degree_assortativity_copurchase",
    # round-6 sixth wave: cluster-blocked semantic dedup (kmeans
    # training + within-cluster pair verify) and the LSH-blocked
    # cross-label argmax — the two heaviest llm7 operators
    "semdedup_cluster_prune",
    "hard_negative_mining",
    # the composed IVF-PQ index: both trainers + probe/ADC search
    "ann_ivfpq_topk",
    # round-7 addition: the corpus-scaled sign-LSH near-dup flagship
    # (auto bits-per-band became the production default this round)
    "dedup_embedding_cosine",
    # round-10 addition (VERDICT r09 #2): the tokenize-the-lake encode
    # stream — likely the heaviest BPE-family member (K trainer passes
    # + one corpus scan + per-doc token-stream assembly)
    "bpe_encode_corpus_stream",
    # round-12 additions (VERDICT r11 #5): the decode-heavy multimodal
    # near-dup families — the real-codec mapInPandas decode panel is
    # the most expensive new code path of rounds 11-12 and needs a
    # regression baseline (image aHash classes + audio energy/ZCR
    # fingerprint classes)
    "dedup_phash_classes",
    "dedup_audiofp_classes",
    "dedup_videofp_classes",
    # round-13 additions: the four-modality curation pipeline (VERDICT
    # r12 #3 — the heaviest composed plan in the registry: six keeper
    # stages + quality gate + token budget over one corpus scan per
    # modality), the scene-cut detector (VERDICT r12 #6 — consecutive-
    # frame byte deltas over real decoded AVI rasters), and the
    # class-pair text near-dup representative (prefix-filtered exact
    # Jaccard between distinct shingle-set classes — the covering
    # variant for the 100x-excluded doc-pair text families)
    "curation_pipeline_v4",
    "multimodal_scene_cut_detect",
    "dedup_jaccard_classes",
    # round-13 second wave: the DSIR hashed-bigram importance
    # selection (corpus bigram stream + bucket-panel scoring join),
    # the VAD-shaped audio activity segmentation, and the scene-cut
    # composed keyframe extractor (full-raster decode + per-frame
    # sums) — the three new training-pipeline stages of this round
    "dsir_importance_select",
    "multimodal_audio_segment",
    "multimodal_keyframe_extract",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibration_ms() -> float:
    """Fixed single-thread busy-loop, reported in ms (VERDICT r13 #1:
    an environment fingerprint).  The work is pinned (10M integer
    adds in interpreted Python, no allocation), so the reading moves
    ONLY with the box — CPU frequency, contention, thermal state —
    never with the engine's code.  Two readings (bench start/end)
    bracket the session; cross-round ratios of this number separate
    box swings from real plan regressions."""
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    assert s > 0
    return round((time.perf_counter() - t0) * 1000.0, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    calib_start = _calibration_ms()

    spark = get_spark(app_name="bench")
    from distributedmapreduce_spark.operators import text as T
    from distributedmapreduce_spark.operators.bucketed import bucketed_table
    from distributedmapreduce_spark.plans.registry import QUERIES

    # Time the one-time bucket-table setup SEPARATELY (VERDICT r10 #2:
    # the bucketed_join tier-2 row must stop conflating the per-session
    # build/re-attach with the steady-state joined read).  Doing it
    # here — before any warm-up round touches the tables — means the
    # tier-2 row below times ONLY the shuffle-free join, and this field
    # records what the layout investment actually cost this session
    # (a full bucketBy write on first contact with a corpus, or a
    # metadata-only DDL re-attach when the files already exist).
    t0 = time.time()
    bucketed_table(spark, sf_dir, "orders", "o_orderkey", 8)
    bucketed_table(spark, sf_dir, "lineitem", "l_orderkey", 8)
    bucket_build_sec = round(time.time() - t0, 3)

    # JVM/codegen + Python-UDF-worker warm-up on the smallest SF (not
    # timed): headline queries should measure steady-state execution,
    # not one-time whole-stage-codegen compilation or executor/UDF
    # worker spin-up — on a long-lived 1000-executor cluster those
    # amortize to zero.  Each headline query is warmed at sf0.001 so
    # its own generated code paths are hot before the timed run.
    _materialize(QUERIES["pandas_udf_zscore"](spark, "/root/testdata/sf0.001"))
    for name in HEADLINE + TIER2:
        _materialize(QUERIES[name](spark, "/root/testdata/sf0.001"))

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    # reference-workload yardstick: inverted index over input.txt
    def _ref() -> None:
        raw = spark.read.text("/root/reference/input.txt")
        _materialize(T.inverted_index(T.pipeline(raw)))

    jobs: list[tuple[str, object]] = [
        (name, lambda name=name: _materialize(QUERIES[name](spark, sf_dir)))
        for name in HEADLINE
    ]
    jobs.append(("ref_inverted_index_input_txt", _ref))

    # One UNTIMED round at the measured SF first: pyspark 4.x's C2
    # compilation of the generated code needs several executions at
    # real data volume to reach steady state (q1 measured 2.1 → 0.80 s
    # across 10 runs), and the sf0.001 warm-up alone leaves the first
    # timed rounds mid-JIT.  Steady-state is the honest metric here —
    # on a long-lived cluster compilation amortizes to zero.
    for _, fn in jobs:
        fn()

    # Min-of-N over INTERLEAVED rounds (q1..qN, q1..qN, ...) rather
    # than back-to-back repeats of each query: a GC pause or page-cache
    # miss then lands on ONE round of a query instead of poisoning all
    # of its runs, so the per-query min converges with far fewer runs.
    timings: dict[str, float] = {name: float("inf") for name, _ in jobs}
    for _ in range(runs):
        for name, fn in jobs:
            t0 = time.time()
            fn()
            timings[name] = min(timings[name], time.time() - t0)
    timings = {name: round(v, 3) for name, v in timings.items()}

    # tier-2: same protocol (untimed steady-state round, interleaved
    # min-of-N) over the expensive non-headline families
    t2_jobs = [
        (name, lambda name=name: _materialize(QUERIES[name](spark, sf_dir)))
        for name in TIER2
    ]
    for _, fn in t2_jobs:
        fn()
    tier2: dict[str, float] = {name: float("inf") for name, _ in t2_jobs}
    for _ in range(runs):
        for name, fn in t2_jobs:
            t0 = time.time()
            fn()
            tier2[name] = min(tier2[name], time.time() - t0)
    tier2 = {name: round(v, 3) for name, v in tier2.items()}

    # COLD-CACHE round (VERDICT r13 #1 / what's-wrong #3): one timed
    # run per query with spark.catalog.clearCache() immediately before
    # it, so persist-using queries are measured WITHOUT plan-equal
    # cache hits from their earlier repetitions.  Reported as separate
    # `*_cold` dicts — ADDITIONS ONLY: the `queries`/`tier2` min-of-N
    # warm protocol above is unchanged, keeping BENCH_r{N} comparable
    # across rounds, while the cold column exposes what cache
    # retention was flattering.  JIT stays warm (this runs last), so
    # cold-vs-warm deltas here are cache effects, not compilation.
    cold: dict[str, float] = {}
    for name, fn in jobs:
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        cold[name] = round(time.time() - t0, 3)
    tier2_cold: dict[str, float] = {}
    for name, fn in t2_jobs:
        spark.catalog.clearCache()
        t0 = time.time()
        fn()
        tier2_cold[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tier2": tier2,
                "tier2_total": round(sum(tier2.values()), 3),
                "sf": sf,
                "runs_per_query": runs,
                "bucket_build_sec": bucket_build_sec,
                # environment fingerprint (VERDICT r13 #1): proves the
                # local[$SPARK_GRAFT_CPUS] contract to the driver and
                # makes box swings visible across rounds
                "cpus": int(
                    os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)
                ),
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "calibration_ms_start": calib_start,
                "calibration_ms_end": _calibration_ms(),
                "queries_cold": cold,
                "tier2_cold": tier2_cold,
            }
        )
    )


if __name__ == "__main__":
    main()
