"""Stage-level timing for curation_pipeline_v4 (optimization round 13).

Rebuilds the v4 stage graph with the same helpers the query uses and
noop-materializes each checkpointed stage in order, so the per-stage
marginal cost is visible (bench.py only times the whole plan).
Mirrors the OPTIMIZED structure: localCheckpoint stage boundaries,
spread minhash input, groupBy+anti-join signature keepers.

Usage: python3 tools/profile_v4.py   [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedmapreduce_spark.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_v4")

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from distributedmapreduce_spark.functions.text import (
        norm_fingerprint,
        tokens,
    )
    from distributedmapreduce_spark.plans.core import spread, t
    from distributedmapreduce_spark.plans.curation import (
        _budget_prefix,
        _P3_Q_DEN,
        _P3_Q_NUM,
        _P4_BUDGET,
    )
    from distributedmapreduce_spark.plans.llm import (
        _PMH_TAU_E6,
        _pmh_candidates,
        _pmh_jac_e6,
        _pmh_signatures,
    )
    from distributedmapreduce_spark.plans.mmq import (
        audiofp_signatures,
        phash_signatures,
        videofp_signatures,
    )
    from distributedmapreduce_spark.plans.registry import QUERIES

    sc = spark.sparkContext

    def stage(name, df):
        sc.setJobDescription(f"v4:{name}")
        dt = noop(df)
        print(f"{name:18s} {dt:7.3f}s", flush=True)
        sc.setJobDescription(None)
        return df

    docs = t(spark, sf, "documents")
    ws = tokens(F.col("text"), lowercase=True)
    feat = stage(
        "feat",
        docs.select(
            "doc_id",
            "text",
            norm_fingerprint(F.col("text")).alias("fp"),
            F.size(ws).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        ).localCheckpoint(eager=False),
    )
    tok = feat.filter(F.col("n_tokens") > 0)
    k2 = stage(
        "k2",
        tok.withColumn(
            "keeper", F.min("doc_id").over(W.partitionBy("fp"))
        )
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text", "n_tokens", "n_distinct")
        .localCheckpoint(eager=False),
    )
    msig = stage(
        "msig",
        _pmh_signatures(
            spread(k2.select("doc_id", "text"))
        ).localCheckpoint(eager=False),
    )
    cand = _pmh_candidates(msig)
    a = msig.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    b = msig.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    mdrops = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_b", _pmh_jac_e6().alias("jac_e6"))
        .filter(F.col("jac_e6") >= _PMH_TAU_E6)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    k3 = stage(
        "k3",
        k2.join(mdrops, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "n_distinct")
        .localCheckpoint(eager=False),
    )

    def _sig_keeper(kin, sig, col):
        sig2 = sig.select(
            F.col("asset_id").alias("doc_id"), F.col("ph").alias(col)
        ).persist()
        keep = sig2.groupBy(col).agg(F.min("doc_id").alias("keep_id"))
        drops = (
            sig2.join(keep, col)
            .filter(F.col("doc_id") != F.col("keep_id"))
            .select("doc_id")
        )
        return kin.join(drops, "doc_id", "left_anti")

    k4 = stage(
        "k4(image)",
        _sig_keeper(
            k3,
            phash_signatures(spark, sf, grid=8, docs=k3.select("doc_id")),
            "iph",
        ).localCheckpoint(eager=False),
    )
    k5 = stage(
        "k5(audio)",
        _sig_keeper(
            k4, audiofp_signatures(spark, sf, docs=k4.select("doc_id")),
            "aph",
        ).localCheckpoint(eager=False),
    )
    k6 = stage(
        "k6(video)",
        _sig_keeper(
            k5, videofp_signatures(spark, sf, docs=k5.select("doc_id")),
            "vph",
        ).localCheckpoint(eager=False),
    )
    k7 = k6.filter(
        _P3_Q_DEN * F.col("n_distinct") >= _P3_Q_NUM * F.col("n_tokens")
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("n_distinct") / F.col("n_tokens").cast("double")).alias(
            "score"
        ),
    )
    stage("sel", _budget_prefix(k7, _P4_BUDGET).select("doc_id"))

    # Whole-query timing for comparison (fresh plan)
    sc.setJobDescription("v4:whole")
    q = QUERIES["curation_pipeline_v4"]
    for tag in ("WHOLE v4 (run 1)", "WHOLE v4 (run 2)"):
        t0 = time.time()
        q(spark, sf).write.format("noop").mode("overwrite").save()
        print(f"{tag:18s} {time.time() - t0:7.3f}s", flush=True)
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
