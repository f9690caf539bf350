"""Storage-layout scale proofs (SCALE.md §1/§3): partitioned writes
must partition-prune on read, and same-bucketed tables must join
without a shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedmapreduce_spark.sources.io import (
    write_bucketed,
    write_partitioned,
)
from distributedmapreduce_spark.sources.testdata import load_table

from .conftest import SF_DIR


def _physical_plan(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    events = load_table(spark, "events", SF_DIR)
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _physical_plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    n_click = events.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    orders = load_table(spark, "orders", SF_DIR)
    lineitem = load_table(spark, "lineitem", SF_DIR)
    write_bucketed(orders, "b_orders", "o_orderkey", 4, "o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 4, "l_orderkey")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = _physical_plan(joined)
        join_part = plan.split("SortMergeJoin")[0]
        # no exchange may feed the join: bucketing replaced the shuffle
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # and the result is still correct
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).groupBy("o_orderpriority").count()
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compaction_reduces_file_count(spark, tmp_path):
    from distributedmapreduce_spark.sources.io import compact

    events = load_table(spark, "events", SF_DIR)
    frag = str(tmp_path / "fragmented")
    events.repartition(37).write.parquet(frag)
    n_before = len([p for p in __import__("os").listdir(frag) if p.endswith(".parquet")])
    assert n_before == 37
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_files=4)
    n_after = len([p for p in __import__("os").listdir(out) if p.endswith(".parquet")])
    assert n_after == 4
    assert spark.read.parquet(out).count() == events.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: a later batch adds a column; a
    mergeSchema read unions the schemas with nulls for the old files."""
    base = str(tmp_path / "evolving")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_totalprice"
    )
    orders.write.parquet(base + "/batch=1")
    orders.withColumn("o_channel", F.lit("web")).write.parquet(
        base + "/batch=2"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {
        "o_orderkey", "o_totalprice", "o_channel", "batch"
    }
    n = orders.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("o_channel").isNull()).count() == n


def test_index_fingerprint_keys_on_params(tmp_path):
    """The persisted-index cache key must change when the build
    params change (else editing seeds/K silently serves a stale
    artifact) and track sub-second source rewrites via mtime_ns."""
    import os

    from distributedmapreduce_spark.operators.index_store import index_path

    src = tmp_path / "corpus.parquet"
    src.write_bytes(b"x" * 64)
    p_a = index_path("minhash", str(src), params=("seeds", (1, 2)))
    p_b = index_path("minhash", str(src), params=("seeds", (1, 3)))
    assert p_a != p_b
    # same-size rewrite with a different mtime_ns -> new key
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    p_a2 = index_path("minhash", str(src), params=("seeds", (1, 2)))
    assert p_a2 != p_a
