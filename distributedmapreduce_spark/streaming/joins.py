"""Stream-stream interval join (Structured Streaming).

The classic funnel join: every purchase within ``within`` after a
click by the same user.  Both sides carry watermarks so the join
state is bounded — clicks older than watermark+within can never match
a future purchase and are evicted.  The batch twin
(``plans.streamq.stream_join_click_purchase``) defines the oracle
semantics; test_streaming.py asserts stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_pairs(
    events: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (click, purchase-by-same-user within the interval).
    Output: (user_id, click_id, purchase_id, lag_s)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within}")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("lag_s"),
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event_id
    arriving within the watermark window (the at-least-once -> 
    exactly-once repair every event pipeline needs).  State is one
    key per event_id, evicted once the watermark passes — bounded,
    unlike a naive dropDuplicates on an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
