"""Structured Streaming operators over the events stream
(SURVEY.md §7.6): watermarked tumbling/sliding window aggregation and
a custom stateful per-key operator via applyInPandasWithState.

The batch twins in ``plans.streamq`` define the oracle semantics; the
tests replay the static events table through a file-source stream and
assert stream output == batch twin (late data handled by watermark).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.testdata import normalize_events_ts


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (schema pinned from the
    batch read; ts normalized to a UTC-instant TIMESTAMP exactly like
    the batch path — nanos-as-long AND TIMESTAMP_NTZ reading modes,
    see sources/testdata.py:normalize_events_ts)."""
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # the file source wants a directory; glob-filter to the events file
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(stream)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts — streaming twin of the
    ``stream_tumbling_counts`` batch query; events later than the
    watermark are dropped (late-data policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked session-window counts — streaming twin of the
    ``session_window_native`` batch query.  session_window is a
    first-class streaming aggregation: Spark merges per-user sessions
    inside the state store and the watermark bounds how long an open
    session can wait for a late event before it is finalized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("sess_start"), "n_events"
        )
    )


USER_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _user_totals_fn(key, pdfs, state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals kept in
    explicit group state (applyInPandasWithState) — the streaming
    generalization of the reference's reducer-side dict accumulation
    (reducer_word_count.py:11-18), with state that survives across
    micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_table(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame to completion over the (finite) file
    source and return the in-memory result table."""
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sdf.sparkSession.table(name)


def ohlc_candles(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked hourly OHLC candles — the continuous-aggregate
    (hypertable) shape as a STREAMING query: open/close via
    min_by/max_by over the (us, event_id) total-order key, which are
    streaming-supported aggregates (unlike window rank functions), so
    the candle updates incrementally per micro-batch and state is one
    candle row per (type, hour)."""
    ev = events.withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    ).withColumn(
        "okey",
        F.struct(
            F.unix_micros("ts").alias("us"), F.col("event_id").alias("eid")
        ),
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by("cents", "okey").alias("open_c"),
            F.max("cents").cast("long").alias("high_c"),
            F.min("cents").cast("long").alias("low_c"),
            F.max_by("cents", "okey").alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.expr("unix_micros(w.start) div 3600000000").alias("hour_bucket"),
            "event_type",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "n",
        )
    )
