"""AQE skew-join plan pin: Spark's adaptive execution splits an
oversized shuffle partition at runtime and marks the join
`skew=true` — the zero-code answer to join skew that complements the
manual salting operator (skew_salted_join_counts).  The pin drives a
deliberately skewed equi-join under test-sized AQE thresholds and
asserts (1) the executed SortMergeJoin carries the skew marker and
(2) the result matches the same join computed without AQE."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_AQE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # test-sized thresholds: a hot key's partition (tens of KB here)
    # must count as "skewed" for the optimization to engage
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def aqe_skew(spark):
    prev = {k: spark.conf.get(k, None) for k in _AQE_CONFS}
    for k, v in _AQE_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # left: every event funneled onto ONE hot key plus a long tail;
    # right: one row per key — the classic hot-key fact-dim join.
    # The repartition(16) matters: AQE splits a skewed REDUCER
    # partition at MAPPER-block granularity, so with a single input
    # file (one map task) the hot partition is one indivisible block
    # and the optimization silently cannot engage — a real-cluster
    # subtlety worth pinning.
    ev = spark.read.parquet(f"{SF}/events.parquet").repartition(16)
    left = ev.select(
        F.when(F.col("event_id") % 10 < 9, F.lit(0))
        .otherwise(F.col("event_id") % 50)
        .alias("k"),
        "event_id",
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    return left, right


def test_aqe_splits_skewed_join(aqe_skew):
    spark = aqe_skew
    left, right = _skewed_frames(spark)
    # NOTE: the pin is on the bare join — an aggregate ABOVE the join
    # requires hashpartitioning(k), and splitting the skewed
    # partition would violate that required distribution, so AQE
    # (correctly) declines to optimize unless
    # spark.sql.adaptive.forceOptimizeSkewedJoin accepts the extra
    # shuffle.  Second real-cluster subtlety this file pins.
    joined = left.join(right, "k")
    joined.collect()
    plan = (
        joined._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "skew=true" in plan, plan


def test_aqe_skew_result_matches_plain(aqe_skew):
    spark = aqe_skew
    left, right = _skewed_frames(spark)
    got = sorted(
        map(
            tuple,
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
            .collect(),
        )
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        exp = sorted(
            map(
                tuple,
                left.join(right, "k")
                .groupBy("k")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("w").alias("sw"),
                )
                .collect(),
            )
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert got == exp
