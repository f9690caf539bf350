"""Spark 4 extension surfaces: the kvjson custom Python DataSource
(reference KV-store format parity) and the transformWithStateInPandas
stateful operator (plan construction always; execution gated on
protobuf availability — see streaming/tws.py docstring)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from distributedmapreduce_spark.sources import kvjson
from distributedmapreduce_spark.sources.testdata import load_table
from distributedmapreduce_spark.streaming import tws

SF = "/root/testdata/sf0.001"
GOLDEN = "/root/reference/solution_database.json"


def test_kvjson_reads_reference_store(spark):
    kvjson.register(spark)
    df = (
        spark.read.format("kvjson")
        .option("numPartitions", "4")
        .load(GOLDEN)
    )
    assert df.rdd.getNumPartitions() == 4
    with open(GOLDEN) as f:
        golden = json.load(f)
    rows = {r["key"]: json.loads(r["value"]) for r in df.collect()}
    assert rows == golden


def test_kvjson_shards_are_disjoint_and_complete(spark):
    kvjson.register(spark)
    df = (
        spark.read.format("kvjson")
        .option("numPartitions", "7")
        .load(GOLDEN)
    )
    keys = [r["key"] for r in df.select("key").collect()]
    assert len(keys) == len(set(keys))  # no key in two shards
    with open(GOLDEN) as f:
        assert len(keys) == len(json.load(f))


def test_kvjson_write_roundtrip(spark, tmp_path):
    kvjson.register(spark)
    out = str(tmp_path / "store.json")
    src = spark.read.format("kvjson").option("numPartitions", "3").load(GOLDEN)
    src.write.format("kvjson").mode("overwrite").save(out)
    with open(out) as f, open(GOLDEN) as g:
        assert json.load(f) == json.load(g)


def test_tws_plan_constructs(spark):
    """Driver-side plan construction needs no protobuf — the operator
    must at least resolve and carry the declared output schema."""
    ev = load_table(spark, "events", SF)
    out = tws.user_totals_tws(ev)
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_cents",
    ]


def test_tws_batch_matches_aggregate(spark):
    """Full execution — skipped where the Python workers lack
    protobuf (this container); runs everywhere else."""
    pytest.importorskip("google.protobuf")
    tws.ensure_batch_tws_support(spark)
    ev = load_table(spark, "events", SF)
    got = sorted(
        tuple(r) for r in tws.user_totals_tws(ev).collect()
    )
    want = sorted(
        tuple(r)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
        )
        .collect()
    )
    assert got == want


def test_kvjson_pushdown_prunes_shards(spark):
    kvjson.register(spark)
    df = (
        spark.read.format("kvjson")
        .option("numPartitions", "8")
        .option("pushdown", "true")
        .load(GOLDEN)
    )
    point = df.filter(F.col("key") == "origin")
    assert point.rdd.getNumPartitions() == 1  # single-shard plan
    rows = point.collect()
    assert len(rows) == 1 and rows[0]["key"] == "origin"
    multi = df.filter(F.col("key").isin("origin", "enable", "no_such_key"))
    assert multi.rdd.getNumPartitions() <= 3
    assert sorted(r["key"] for r in multi.collect()) == ["enable", "origin"]
    # contradictory equality predicates -> empty, no crash
    assert df.filter((F.col("key") == "a") & (F.col("key") == "b")).count() == 0
    # pushed result must equal post-scan filtering on the plain reader
    plain = (
        spark.read.format("kvjson")
        .option("numPartitions", "8")
        .load(GOLDEN)
        .filter(F.col("key") == "origin")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in plain]
