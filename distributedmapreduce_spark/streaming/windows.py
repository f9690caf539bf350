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


ROLLING_SPEND_SCHEMA = "user_id long, event_id long, spend_7d_c long"
_ROLL_STATE_SCHEMA = "us array<long>, eid array<long>, cents array<long>"
_ROLL_7D_US = 7 * 86_400 * 1_000_000


def _rolling_spend_fn(key, pdfs, state: GroupState):
    """Trailing-7-day spend per purchase with UPDATE semantics and
    BOUNDED state: state holds the user's purchase rows inside the
    7-day-past-watermark horizon (sorted triplet arrays, DEDUP'd by
    event_id — an at-least-once source redelivering a retained row
    adds nothing); every batch merges its rows in and re-emits the
    trailing sum for EVERY retained event, so a late-arriving older
    purchase retro-corrects the sums of the events inside its 7-day
    shadow (the memory-sink reader keeps the last emit per event_id).
    RANGE-frame semantics match the batch twin exactly: the window
    for event i is all purchases with us in [us_i - 7d, us_i]
    INCLUSIVE of same-instant peers, computed by prefix sums + bisect
    over the sorted history.  Watermark discipline, two cutoffs:
    events BELOW the watermark are FINAL — no future arrival can sit
    inside their window (Spark drops later-late rows, so every future
    contributor has ts ≥ wm > us_event) — so they stop being
    re-emitted (their last emission already holds the final value);
    rows below wm − 7d additionally leave state entirely, because
    every event that will still be emitted has us ≥ wm and a window
    floor ≥ wm − 7d.  Rows in the [wm − 7d, wm) shadow are retained
    as CONTRIBUTORS only — still summed into live windows, no longer
    emitted.  Redelivery of an evicted row is dropped by the
    watermark gate, so forgetting evicted event_ids is safe.  With no
    watermark configured the whole history is retained and re-emitted
    (the fn drives both modes — tests/test_streaming.py)."""
    import bisect

    (user_id,) = key
    if state.exists:
        us, eid, cents = (list(x) for x in state.get)
    else:
        us, eid, cents = [], [], []
    seen = set(eid)
    for pdf in pdfs:
        for u, e, c in zip(pdf["us"], pdf["event_id"], pdf["cents"]):
            e = int(e)
            if e in seen:
                continue
            seen.add(e)
            us.append(int(u))
            eid.append(e)
            cents.append(int(c))
    order = sorted(range(len(us)), key=lambda i: (us[i], eid[i]))
    us = [us[i] for i in order]
    eid = [eid[i] for i in order]
    cents = [cents[i] for i in order]
    try:
        wm_us = state.getCurrentWatermarkMs() * 1000
    except Exception:  # noqa: BLE001 — [CANNOT_WITHOUT] no-watermark
        wm_us = 0
    cut = bisect.bisect_left(us, wm_us - _ROLL_7D_US)
    state.update((us[cut:], eid[cut:], cents[cut:]))
    pref = [0]
    for c in cents:
        pref.append(pref[-1] + c)
    # emit only the still-mutable events (us >= watermark); their
    # windows are computed over the FULL retained history, including
    # the shadow contributors below the watermark
    emit = bisect.bisect_left(us, wm_us)
    sums = [
        pref[bisect.bisect_right(us, u)]
        - pref[bisect.bisect_left(us, u - _ROLL_7D_US)]
        for u in us[emit:]
    ]
    yield pd.DataFrame(
        {
            "user_id": [user_id] * (len(us) - emit),
            "event_id": eid[emit:],
            "spend_7d_c": sums,
        }
    )


def rolling_spend_stateful(events: DataFrame) -> DataFrame:
    """STREAMING twin of plans/analytics3.py::rolling_7d_user_spend —
    the trailing time-window ML feature as a custom stateful operator
    (applyInPandasWithState, update mode): per micro-batch the
    affected users' features are re-emitted with corrections, which
    is how a feature store keeps "spend in the last 7 days as of the
    event" fresh under out-of-order arrival.  Parity with the batch
    RANGE-frame window is pinned in tests/test_streaming.py."""
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return p.groupBy("user_id").applyInPandasWithState(
        _rolling_spend_fn,
        outputStructType=ROLLING_SPEND_SCHEMA,
        stateStructType=_ROLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_SCHEMA = "k long, got long, kth_h long"
_KMV_STATE_SCHEMA = "hs array<long>, us array<long>"
_KMV_K = 32


def _kmv_fn(key, pdfs, state: GroupState):
    """Streaming K-minimum-values sketch: state is the <=K smallest
    (hash, user) pairs seen so far, ordered by (h, user) — KMV union
    is "K smallest of the union", so merging a micro-batch is just
    insert + trim.  Per-user dedup is pair membership: a user's hash
    is a pure function of the user, so a LIVE duplicate is caught by
    membership and an EVICTED user's pair is >= the current kth pair
    by construction (it was evicted because K better pairs exist) and
    trims itself back out — `got` stays the size of the live set, so
    re-deliveries can never double-count.  Bounded state: exactly K
    pairs, whatever the stream's cardinality.  At production scale
    the same sketch runs two-level (per-partition KMV then a K-merge)
    to avoid the single-key funnel; this operator is the semantic
    twin the batch query pins."""
    if state.exists:
        hs, us = (list(x) for x in state.get)
    else:
        hs, us = [], []
    pairs = set(zip(hs, us))
    for pdf in pdfs:
        for h, u in zip(pdf["h"], pdf["user_id"]):
            pairs.add((int(h), int(u)))
    top = sorted(pairs)[:_KMV_K]
    state.update(([h for h, _ in top], [u for _, u in top]))
    yield pd.DataFrame(
        {
            "k": [_KMV_K],
            "got": [len(top)],
            "kth_h": [top[-1][0] if top else 0],
        }
    )


def kmv_distinct_stateful(events: DataFrame) -> DataFrame:
    """STREAMING twin of plans/streamq.py::stream_kmv_distinct_users —
    the mergeable distinct-count sketch maintained incrementally
    (applyInPandasWithState, update mode): each micro-batch folds its
    users' portable md5-u32 hashes into the K-smallest state and
    re-emits the sketch row.  Parity with the batch K-smallest scan
    is pinned in tests/test_streaming.py."""
    from ..plans.llm3 import _md5_u32

    h = events.select(
        F.lit(1).alias("g"),
        "user_id",
        _md5_u32("skmv", F.col("user_id")).alias("h"),
    )
    return h.groupBy("g").applyInPandasWithState(
        _kmv_fn,
        outputStructType=KMV_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DDS_SCHEMA = "bkts string, cnts string, n long"
_DDS_STATE_SCHEMA = "bkts array<long>, cnts array<long>"


def _dds_fn(key, pdfs, state: GroupState):
    """Streaming base-2 DDSketch of the value column (cents
    bit-length buckets): state is the bucket->count map — a PURE SUM
    sketch, so micro-batch merge is bucket-wise addition and the
    result is arrival-order independent (the property that makes the
    parity with the one-shot batch histogram exact).  Bounded state:
    <= 41 buckets for any int64 cents, whatever the stream length."""
    if state.exists:
        bkts, cnts = (list(x) for x in state.get)
        counts = dict(zip(bkts, cnts))
    else:
        counts = {}
    for pdf in pdfs:
        cents = pdf["value"].mul(100).round().astype("int64")
        for c in cents:
            b = int(c).bit_length()
            counts[b] = counts.get(b, 0) + 1
    ordered = sorted(counts.items())
    state.update(([b for b, _ in ordered], [c for _, c in ordered]))
    # Emission serializes the parallel lists to comma-joined strings
    # — the repo's oracle-hashing convention (plans/textq.py:77) and
    # the exact shape of the batch twin stream_ddsketch_value_hist,
    # so the stream==batch parity compares scalars only.  State keeps
    # the native array form.
    yield pd.DataFrame(
        {
            "bkts": [",".join(str(b) for b, _ in ordered)],
            "cnts": [",".join(str(c) for _, c in ordered)],
            "n": [sum(counts.values())],
        }
    )


def ddsketch_value_stateful(events: DataFrame) -> DataFrame:
    """STREAMING twin of plans/streamq.py::stream_ddsketch_value_hist
    — the mergeable quantile sketch maintained incrementally
    (applyInPandasWithState, update mode); see
    plans/analytics4.py::ddsketch_pow2_quantiles for the batch
    readout math.  At production scale the same sketch runs
    per-partition then bucket-sums (it is a counter matrix); the
    single-key form here is the semantic twin the batch query pins."""
    ev = events.select(F.lit(1).alias("g"), "value")
    return ev.groupBy("g").applyInPandasWithState(
        _dds_fn,
        outputStructType=DDS_SCHEMA,
        stateStructType=_DDS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_SCHEMA = (
    "user_id long, first_view_us long, first_click_us long, "
    "first_purchase_us long, funnel_stage long"
)
_FUNNEL_STATE_SCHEMA = "tv long, tc long, tp long"
_FUNNEL_NONE = -1


def _funnel_stage(tv: int, tc: int, tp: int) -> int:
    """Monotone first-occurrence funnel stage from the three per-user
    first timestamps (−1 = never seen): stage k needs every earlier
    stage's FIRST occurrence at or before stage k's first."""
    if tv == _FUNNEL_NONE:
        return 0
    if tc == _FUNNEL_NONE or tc < tv:
        return 1
    if tp == _FUNNEL_NONE or tp < tc:
        return 2
    return 3


def _funnel_fn(key, pdfs, state: GroupState):
    """Per-user funnel state = the MIN first-occurrence timestamp of
    each stage event — a semilattice (min is commutative/associative/
    idempotent), so micro-batch order and late or re-delivered events
    can never corrupt it: a late early view simply LOWERS tv and the
    derived stage recomputes from the merged firsts at emission.
    (The strictly-sequential funnel — event_funnel_conversion's
    each-stage-after-the-previous semantics — is deliberately NOT
    used here: it would need unbounded per-user event history to
    retro-correct, i.e. it is not foldable with bounded state.)"""
    (user_id,) = key
    tv, tc, tp = (
        state.get if state.exists
        else (_FUNNEL_NONE, _FUNNEL_NONE, _FUNNEL_NONE)
    )
    for pdf in pdfs:
        us = pdf["us"]
        for ty, cur in (("view", tv), ("click", tc), ("purchase", tp)):
            m = us[pdf["event_type"] == ty]
            if len(m):
                lo = int(m.min())
                if cur == _FUNNEL_NONE or lo < cur:
                    if ty == "view":
                        tv = lo
                    elif ty == "click":
                        tc = lo
                    else:
                        tp = lo
    state.update((tv, tc, tp))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "first_view_us": [tv],
            "first_click_us": [tc],
            "first_purchase_us": [tp],
            "funnel_stage": [_funnel_stage(tv, tc, tp)],
        }
    )


def funnel_stage_stateful(events: DataFrame) -> DataFrame:
    """STREAMING twin of plans/streamq.py::stream_funnel_stage — the
    per-user monotone first-occurrence funnel maintained in bounded
    explicit state (3 min-timestamps per user).  Parity with the
    batch min-per-type scan is pinned in tests/test_streaming.py
    (11th stream==batch parity)."""
    ev = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CLAMP_SCHEMA = (
    "user_id long, n_events long, final_s long,"
    " final_balance long, peak_balance long"
)
_CLAMP_STATE_SCHEMA = (
    "base_n long, base_s long, base_bal long, base_peak long, "
    "us array<long>, eid array<long>, dc array<long>"
)


def _clamped_balance_fn(key, pdfs, state: GroupState):
    """Zero-clamped running balance per user with UPDATE semantics
    and BOUNDED state: the folded watermark-old prefix as four
    scalars (base_n, base_s, base_bal, base_peak) plus the mutable
    tail of (ts, event_id, delta) rows at or above the watermark.
    Every batch merges its rows into the tail (DEDUP'd by event_id —
    an at-least-once source redelivering a retained event adds
    nothing), re-sorts the tail, and replays the literal Lindley
    recursion b_t = max(0, b_{t-1} + d_t) ON TOP of the folded base —
    so a late-arriving older event retro-corrects every subsequent
    clamp (the recursion is NONLINEAR; nothing short of replay over
    the still-mutable suffix is correct).  After emission, tail rows
    with event time strictly below the current watermark fold into
    the base: Spark drops rows later than the watermark before they
    reach this function, so the folded prefix can never be reordered
    by a future arrival and its contribution is a constant — state
    size is O(in-watermark tail), not O(history) (redelivery of an
    already-folded event is likewise dropped by the watermark gate,
    so forgetting folded event_ids is safe).  The batch twin computes
    the reflection closed form b_t = S_t − min(0, min_{k<=t} S_k);
    the parity test pins the identity between the two formulations on
    real data, and tests/test_streaming.py drives the fold + dedup
    paths directly."""
    (user_id,) = key
    if state.exists:
        bn, bs, bb, bp, us, eid, dc = state.get
        us, eid, dc = list(us), list(eid), list(dc)
    else:
        bn = bs = bb = bp = 0
        us, eid, dc = [], [], []
    seen = set(eid)
    for pdf in pdfs:
        for u, e, d in zip(pdf["us"], pdf["event_id"], pdf["dc"]):
            e = int(e)
            if e in seen:
                continue
            seen.add(e)
            us.append(int(u))
            eid.append(e)
            dc.append(int(d))
    order = sorted(range(len(us)), key=lambda i: (us[i], eid[i]))
    us = [us[i] for i in order]
    eid = [eid[i] for i in order]
    dc = [dc[i] for i in order]
    s, bal, peak = bs, bb, bp
    for d in dc:
        s += d
        bal = max(0, bal + d)
        peak = max(peak, bal)
    # fold the watermark-old prefix into the running base scalars;
    # with no watermark configured PySpark RAISES from the accessor
    # (rather than returning 0), and the whole tail stays mutable
    try:
        wm_us = state.getCurrentWatermarkMs() * 1000
    except Exception:  # noqa: BLE001 — [CANNOT_WITHOUT] no-watermark
        wm_us = 0
    cut = 0
    while cut < len(us) and us[cut] < wm_us:
        cut += 1
    for d in dc[:cut]:
        bs += d
        bb = max(0, bb + d)
        bp = max(bp, bb)
    bn += cut
    state.update((bn, bs, bb, bp, us[cut:], eid[cut:], dc[cut:]))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [bn + len(dc) - cut],
            "final_s": [s],
            "final_balance": [bal],
            "peak_balance": [peak],
        }
    )


def clamped_balance_stateful(events: DataFrame) -> DataFrame:
    """STREAMING twin of plans/analytics4.py::clamped_running_balance
    — the prepaid-wallet / queue-backlog Lindley recursion maintained
    incrementally (applyInPandasWithState, update mode).  The 12th
    stream==batch parity (tests/test_streaming.py) pins that the
    streaming literal recursion equals the batch reflection
    closed-form — the strongest kind of twin: two DIFFERENT
    formulations of a nonlinear sequential operator agreeing on real
    data."""
    d = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(-F.round(F.col("value") * 100).cast("long"))
        .alias("dc"),
    )
    return d.groupBy("user_id").applyInPandasWithState(
        _clamped_balance_fn,
        outputStructType=CLAMP_SCHEMA,
        stateStructType=_CLAMP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
