"""Storage-bucketing plan pins (operators/bucketed.py).

The registered query keeps the natural plan (at test scale AQE
rightly broadcasts the small side).  The property bucketing BUYS —
a SortMergeJoin fed directly from the bucketed files with NO
Exchange on either side — only engages when neither side broadcasts,
so the pin disables auto-broadcast and asserts the shuffle-free
shape explicitly: this is exactly the 100 TB fact-fact regime.
"""

from __future__ import annotations

import pytest

from distributedmapreduce_spark.operators.bucketed import bucketed_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _executed(df) -> str:
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_bucketed_join_is_shuffle_free(no_broadcast):
    spark = no_broadcast
    o = bucketed_table(spark, SF, "orders", "o_orderkey", 8)
    li = bucketed_table(spark, SF, "lineitem", "l_orderkey", 8)
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderkey", "l_extendedprice"
    )
    plan = _executed(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    # write-time sortBy means the merge join needs no extra sort of
    # full partitions beyond the per-bucket ordering already on disk
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_bucketed_groupby_needs_no_exchange(no_broadcast):
    spark = no_broadcast
    o = bucketed_table(spark, SF, "orders", "o_orderkey", 8)
    from pyspark.sql import functions as F

    agg = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_table_reused_within_session(spark):
    a = bucketed_table(spark, SF, "orders", "o_orderkey", 8)
    names = [t.name for t in spark.catalog.listTables()]
    b = bucketed_table(spark, SF, "orders", "o_orderkey", 8)
    assert [t.name for t in spark.catalog.listTables()] == names
    assert a.count() == b.count()


def test_bucketed_join_matches_plain_join(spark):
    o = bucketed_table(spark, SF, "orders", "o_orderkey", 8)
    li = bucketed_table(spark, SF, "lineitem", "l_orderkey", 8)
    got = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    raw_o = spark.read.parquet(f"{SF}/orders.parquet")
    raw_l = spark.read.parquet(f"{SF}/lineitem.parquet")
    exp = (
        raw_o.join(raw_l, raw_o["o_orderkey"] == raw_l["l_orderkey"])
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
