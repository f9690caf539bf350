"""Salting parity: salted join/agg must be output-identical to the
plain formulations (the whole point is plan shape, not semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedmapreduce_spark.operators.skew import salted_count, salted_join
from distributedmapreduce_spark.sources.testdata import load_table

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    events = load_table(spark, "events", SF_DIR)
    dim = events.select("event_type").distinct().withColumn(
        "flag", F.length("event_type")
    )
    plain = events.join(dim, "event_type").groupBy("event_type").count()
    salted = (
        salted_join(events, dim, on="event_type", n_salts=4)
        .groupBy("event_type")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_count_matches_group_count(spark):
    events = load_table(spark, "events", SF_DIR)
    plain = {r[0]: r[1] for r in events.groupBy("user_id").count().collect()}
    salted = {r[0]: r[1] for r in salted_count(events, "user_id", 4).collect()}
    assert plain == salted


def test_salt_spreads_hot_key(spark):
    """All rows of one hot key must land in >1 salt bucket."""
    from distributedmapreduce_spark.operators.skew import _row_salt

    events = load_table(spark, "events", SF_DIR)
    hot = events.filter(F.col("event_type") == "click")
    n = (
        hot.withColumn("s", _row_salt(hot, 8))
        .select("s")
        .distinct()
        .count()
    )
    assert n > 1
