"""Event-time window aggregations — batch twins of the Structured
Streaming queries in ``streaming/windows.py`` (SURVEY.md §7.6).

The batch twin runs the same logical window aggregation over the
static events table so the DuckDB oracle can check it; the streaming
module runs the identical plan over a stream with a watermark and the
test suite asserts stream == batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .core import EVENTS_US, query, t


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS wstart, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM {EVENTS_US} events GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1h event-time windows per event type."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


@query(
    "stream_sliding_counts",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS wstart, event_type, value
      FROM {EVENTS_US} events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type, value
      FROM {EVENTS_US} events)
    SELECT wstart, event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM assigned GROUP BY wstart, event_type
    """,
)
def stream_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows: 1h length, 30min slide — every event lands in
    exactly two windows (oracle enumerates them by hand)."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


@query(
    "sessionization",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM {EVENTS_US} events),
    sessions AS (
      SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization (30min inactivity gap) via lag + cumulative sum —
    the batch formulation of streaming session_window(ts, '30 minutes')."""
    ev = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "duration_us"
        ),
    )


@query(
    "session_window_native",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM {EVENTS_US} events),
    sessions AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM marked)
    SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    """Spark's NATIVE session_window operator (the streaming-capable
    one — sessionization above is the lag+cumsum batch formulation;
    this entry makes the built-in operator itself driver-visible).
    Boundary semantics: session_window merges an event into the
    current session only while gap < 30min STRICTLY — a gap of
    exactly 30min starts a new session — so the oracle marks new
    sessions with >= INTERVAL 30 MINUTE (the lag+cumsum twin uses >,
    which only agrees because no gap in this dataset lands exactly on
    the boundary; here the semantics are pinned correctly regardless
    of data).  Scale: session_window is a first-class aggregation —
    one (user_id) shuffle, sessions merged within partitions, and in
    streaming mode the same plan runs with watermark-bounded state."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("sess_start"), "n_events"
        )
    )


@query(
    "stream_join_click_purchase",
    oracle=f"""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(floor(epoch(p.ts - c.ts)) AS BIGINT) AS lag_s
    FROM {EVENTS_US} c
    JOIN {EVENTS_US} p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_join_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/joins.py): purchases within 1h after a same-user
    click.  Same shape as the range join — equi key (user) plus a
    time interval, never a cartesian."""
    from ..streaming.joins import click_purchase_pairs

    return click_purchase_pairs(t(spark, sf, "events"))


@query(
    "stateful_user_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stateful_user_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState custom stateful
    operator (streaming/windows.py::user_totals_stateful): per-user
    event counts + value totals.  The streaming version keeps the
    SAME (n, total) pair in explicit group state across micro-batches
    and its final state equals this aggregate —
    tests/test_streaming.py::test_stateful_user_totals_matches_batch
    asserts the equivalence; this entry makes the stateful family
    driver-visible.  Float note: the stateful operator accumulates in
    arrival order while this aggregate reduces in partition order, so
    the oracle checks the BATCH aggregate (exactly what the stream's
    converged state must match at 2dp)."""
    ev = t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "stream_ohlc_candles",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} events),
    o AS (
      SELECT event_type, us // 3600000000 AS hour_bucket, cents,
             row_number() OVER (PARTITION BY event_type, us // 3600000000
                                ORDER BY us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, us // 3600000000
                                ORDER BY us DESC, event_id DESC) AS rn_z
      FROM e)
    SELECT hour_bucket, event_type,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
           CAST(max(cents) AS BIGINT) AS high_c,
           CAST(min(cents) AS BIGINT) AS low_c,
           CAST(max(CASE WHEN rn_z = 1 THEN cents END) AS BIGINT) AS close_c,
           CAST(count(*) AS BIGINT) AS n
    FROM o GROUP BY 1, 2
    """,
)
def stream_ohlc_candles(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING OHLC candle aggregate
    (streaming/windows.py::ohlc_candles, stream==batch parity in
    tests/test_streaming.py): open/close selected by min_by/max_by
    over the (us, event_id) struct key — the streaming-compatible
    first/last (window rank functions are not allowed on streams; a
    lexicographic arg-min over a unique key is, and is deterministic).
    The oracle is the independent dual-row_number formulation (shared
    with ohlc_resample), so the min_by path gets its own hash-grade
    check.  Scale: per-candle state is 5 numbers; updates are
    map-side combinable — the continuous aggregate every hypertable
    maintains incrementally."""
    ev = t(spark, sf, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    ).withColumn(
        "okey",
        F.struct(
            F.unix_micros("ts").alias("us"), F.col("event_id").alias("eid")
        ),
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("cents", "okey").alias("open_c"),
            F.max("cents").cast("long").alias("high_c"),
            F.min("cents").cast("long").alias("low_c"),
            F.max_by("cents", "okey").alias("close_c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.expr("unix_micros(w.start) div 3600000000").alias(
                "hour_bucket"
            ),
            "event_type",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "n",
        )
    )


def _kmv_users_oracle() -> str:
    from .llm3 import _md5_u32_sql

    h = _md5_u32_sql("skmv", "user_id")
    return f"""
    WITH ks AS (SELECT DISTINCT user_id FROM events),
    hs AS (SELECT {h} AS h, user_id FROM ks),
    tk AS (SELECT h, user_id FROM hs ORDER BY h, user_id LIMIT 32)
    SELECT CAST(32 AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS got,
           CAST(coalesce(max(h), 0) AS BIGINT) AS kth_h
    FROM tk
    """


@query("stream_kmv_distinct_users", oracle=_kmv_users_oracle())
def stream_kmv_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING KMV distinct-user sketch
    (streaming/windows.py::kmv_distinct_stateful): the K=32 smallest
    (md5-u32 hash, user_id) pairs over the distinct users of the
    events table, published as pure sketch state (size + kth hash) so
    both engines — and the incremental streaming fold — agree
    bit-for-bit.  Pairs (not bare hashes) make the boundary total-
    ordered, which is what lets the streaming state prove its
    re-delivery-safety by pair membership.  The 9th stream==batch
    parity (tests/test_streaming.py) pins that folding micro-batches
    through bounded K-pair state reaches exactly this scan's answer —
    the mergeable-sketch property in executable form."""
    from .llm3 import _md5_u32

    hs = (
        t(spark, sf, "events")
        .select("user_id")
        .distinct()
        .select(
            _md5_u32("skmv", F.col("user_id")).alias("h"), "user_id"
        )
    )
    tk = hs.orderBy("h", "user_id").limit(32)
    return tk.agg(
        F.lit(32).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("got"),
        F.coalesce(F.max("h"), F.lit(0)).cast("long").alias("kth_h"),
    )


@query(
    "stream_ddsketch_value_hist",
    oracle=f"""
    WITH c AS (
      SELECT length(bin(CAST(round(value * 100) AS BIGINT))) AS bkt,
             CAST(count(*) AS BIGINT) AS cnt
      FROM {EVENTS_US} events GROUP BY 1)
    SELECT array_to_string(list(CAST(bkt AS BIGINT) ORDER BY bkt), ',') AS bkts,
           array_to_string(list(cnt ORDER BY bkt), ',') AS cnts,
           CAST(sum(cnt) AS BIGINT) AS n
    FROM c
    """,
)
def stream_ddsketch_value_hist(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING base-2 DDSketch
    (streaming/windows.py::ddsketch_value_stateful): the bucket
    histogram of event value cents by bit-length — the same mergeable
    quantile-sketch state ddsketch_pow2_quantiles reads quantiles
    from, published as sorted parallel lists serialized to
    comma-joined strings (the repo's oracle-hashing convention,
    textq.py:77) so the driver hash pins the ENTIRE sketch, not a
    summary, and the driver's pandas canonicalizer — which cannot
    sort list cells — sees only scalar columns.  The 10th stream==batch parity
    (tests/test_streaming.py) pins that folding micro-batches through
    the bucket-sum state reaches exactly this one-shot scan's answer
    — sum-sketch mergeability in executable form.

    Scale: one events scan to <= 41 (bucket, count) rows,
    map-side combinable; the array packing is a 1-row collect of a
    bounded set."""
    c = (
        t(spark, sf, "events")
        .select(
            F.length(
                F.bin(F.round(F.col("value") * 100).cast("long"))
            ).cast("long").alias("bkt")
        )
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    s = c.agg(
        F.sort_array(
            F.collect_list(F.struct("bkt", "cnt"))
        ).alias("ps"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return s.select(
        F.array_join(
            F.expr("transform(ps, p -> CAST(p.bkt AS STRING))"), ","
        ).alias("bkts"),
        F.array_join(
            F.expr("transform(ps, p -> CAST(p.cnt AS STRING))"), ","
        ).alias("cnts"),
        "n",
    )


@query(
    "stream_funnel_stage",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us
      FROM {EVENTS_US} events),
    m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN us END) AS tv,
             min(CASE WHEN event_type = 'click' THEN us END) AS tc,
             min(CASE WHEN event_type = 'purchase' THEN us END) AS tp
      FROM e GROUP BY 1)
    SELECT user_id,
           coalesce(tv, -1) AS first_view_us,
           coalesce(tc, -1) AS first_click_us,
           coalesce(tp, -1) AS first_purchase_us,
           CAST(CASE WHEN tv IS NULL THEN 0
                     WHEN tc IS NULL OR tc < tv THEN 1
                     WHEN tp IS NULL OR tp < tc THEN 2
                     ELSE 3 END AS BIGINT) AS funnel_stage
    FROM m
    """,
)
def stream_funnel_stage(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the STREAMING per-user funnel tracker
    (streaming/windows.py::funnel_stage_stateful): the MONOTONE
    FIRST-OCCURRENCE funnel — stage k is reached iff every earlier
    stage's first occurrence is at or before stage k's first
    (view ≤ click ≤ purchase on FIRST timestamps).  This is the
    mergeable definition: per-user state is three min-timestamps (a
    semilattice), so the streaming fold is arrival-order independent
    and late data retro-corrects exactly — unlike the strictly-
    sequential semantics of event_funnel_conversion, which is
    deliberately left to batch (it would need unbounded history to
    fold).  The 11th stream==batch parity (tests/test_streaming.py)
    pins that folding micro-batches through the min-state reaches
    exactly this one-shot scan's answer.

    Scale: one events scan, one map-side-combinable conditional-min
    aggregate; output is user-bounded, no windows, no joins."""
    m = (
        t(spark, sf, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("us"))
            ).alias("tv"),
            F.min(
                F.when(F.col("event_type") == "click", F.col("us"))
            ).alias("tc"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("us"))
            ).alias("tp"),
        )
    )
    return m.select(
        "user_id",
        F.coalesce("tv", F.lit(-1)).alias("first_view_us"),
        F.coalesce("tc", F.lit(-1)).alias("first_click_us"),
        F.coalesce("tp", F.lit(-1)).alias("first_purchase_us"),
        F.when(F.col("tv").isNull(), F.lit(0))
        .when(
            F.col("tc").isNull() | (F.col("tc") < F.col("tv")),
            F.lit(1),
        )
        .when(
            F.col("tp").isNull() | (F.col("tp") < F.col("tc")),
            F.lit(2),
        )
        .otherwise(F.lit(3))
        .cast("long")
        .alias("funnel_stage"),
    )
