"""Structured Streaming == batch-twin equivalence (SURVEY.md §5.3 /
§7.6): the streamed events table must produce exactly the batch
window aggregates, and the custom stateful operator must match a
plain groupBy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedmapreduce_spark.plans.registry import QUERIES
from distributedmapreduce_spark.sources.testdata import load_table
from distributedmapreduce_spark.streaming import windows as SW

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.tumbling_counts(stream), "t_tumbling", "complete"
    )
    batch = QUERIES["stream_tumbling_counts"](spark, SF)
    cols = ["wstart", "event_type", "n", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_sliding_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.sliding_counts(stream), "t_sliding", "complete"
    )
    batch = QUERIES["stream_sliding_counts"](spark, SF)
    cols = ["wstart", "event_type", "n", "total_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_session_window_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.session_counts(stream), "t_session", "complete"
    )
    batch = QUERIES["session_window_native"](spark, SF)
    cols = ["user_id", "sess_start", "n_events"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stateful_user_totals_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.user_totals_stateful(stream), "t_state", "update"
    )
    # update mode emits one row per user per micro-batch; the LAST row
    # per user is the final state
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, "events", SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_stream_stream_join_matches_batch(spark):
    from distributedmapreduce_spark.streaming.joins import click_purchase_pairs

    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        click_purchase_pairs(stream), "t_ssjoin", "append"
    )
    batch = QUERIES["stream_join_click_purchase"](spark, SF)
    cols = ["user_id", "click_id", "purchase_id", "lag_s"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_dedup_drops_redeliveries(spark):
    from distributedmapreduce_spark.streaming.joins import dedup_events_stream

    # simulate at-least-once delivery: the stream source reads the
    # events file, we union it with itself batch-side first
    stream = SW.stream_events(spark, SF)
    deduped = dedup_events_stream(stream.union(stream))
    out = SW.run_stream_to_table(deduped, "t_dedup", "append")
    batch_n = load_table(spark, "events", SF).count()
    assert out.count() == batch_n
    assert out.select("event_id").distinct().count() == batch_n


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """foreachBatch sink: stream micro-batches land in parquet with
    batch ids; total rows equal the source (the idempotent-writer
    pattern — a real deployment keys the write on batch_id)."""
    out = str(tmp_path / "sink")

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out)

    stream = SW.stream_events(spark, SF)
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    assert written.count() == load_table(spark, "events", SF).count()
    assert "batch_id" in written.columns


def test_stream_ohlc_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.ohlc_candles(stream), "t_ohlc", "complete"
    )
    batch = QUERIES["stream_ohlc_candles"](spark, SF)
    cols = [
        "hour_bucket", "event_type", "open_c", "high_c", "low_c",
        "close_c", "n",
    ]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_rolling_spend_matches_batch(spark):
    """8th stream==batch parity: the stateful trailing-7d spend
    feature (update mode, last emit per event_id wins) must equal the
    batch RANGE-frame window."""
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.rolling_spend_stateful(stream), "t_rolling", "update"
    )
    # update mode re-emits rows; last value per event_id is current
    latest = {
        r.event_id: (r.user_id, r.spend_7d_c) for r in out.collect()
    }
    batch = QUERIES["rolling_7d_user_spend"](spark, SF)
    expect = {
        r.event_id: (r.user_id, r.spend_7d_c) for r in batch.collect()
    }
    assert latest == expect


def test_rolling_spend_fn_corrects_across_batches():
    """Multi-batch late-data semantics, exercised directly (the file
    source delivers one micro-batch, so the streaming parity above
    can't reach this path): an older purchase arriving in batch 2
    must retro-correct the trailing sums of the events in its 7-day
    shadow."""
    import pandas as pd

    from distributedmapreduce_spark.streaming.windows import (
        _ROLL_7D_US,
        _rolling_spend_fn,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    day = 86_400_000_000
    b1 = pd.DataFrame(
        {"us": [10 * day, 12 * day], "event_id": [2, 3],
         "cents": [100, 50]}
    )
    out1 = next(_rolling_spend_fn((7,), [b1], st))
    assert dict(zip(out1.event_id, out1.spend_7d_c)) == {2: 100, 3: 150}
    # batch 2: a LATE purchase at day 9 (inside both shadows) and a
    # fresh one at day 25 (outside every prior window)
    b2 = pd.DataFrame(
        {"us": [9 * day, 25 * day], "event_id": [1, 4],
         "cents": [7, 20]}
    )
    out2 = next(_rolling_spend_fn((7,), [b2], st))
    got = dict(zip(out2.event_id, out2.spend_7d_c))
    assert got == {1: 7, 2: 107, 3: 157, 4: 20}


def test_stream_kmv_matches_batch(spark):
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.kmv_distinct_stateful(stream), "t_kmv", "update"
    )
    batch = QUERIES["stream_kmv_distinct_users"](spark, SF)
    cols = ["k", "got", "kth_h"]
    # update mode re-emits the sketch row per micro-batch; the LAST
    # emission is the final folded state
    got = _rows(out, cols)[-1]
    assert [got] == _rows(batch, cols)


def test_stream_ddsketch_matches_batch(spark):
    """10th stream==batch parity: the base-2 DDSketch bucket histogram
    folded through applyInPandasWithState bucket-sum state equals the
    one-shot batch scan — sum-sketch mergeability, executably."""
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.ddsketch_value_stateful(stream), "t_dds", "update"
    )
    batch = QUERIES["stream_ddsketch_value_hist"](spark, SF)
    cols = ["bkts", "cnts", "n"]
    # update mode re-emits the sketch per micro-batch; the emission
    # with the largest n is the final folded state
    got = max(_rows(out, cols), key=lambda r: r[2])
    assert [got] == _rows(batch, cols)


def test_stream_funnel_stage_matches_batch(spark):
    """11th stream==batch parity: the per-user monotone
    first-occurrence funnel folded through 3-min-timestamp state
    equals the one-shot batch conditional-min scan — min-semilattice
    mergeability, executably."""
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.funnel_stage_stateful(stream), "t_funnel", "update"
    )
    batch = QUERIES["stream_funnel_stage"](spark, SF)
    cols = [
        "user_id",
        "first_view_us",
        "first_click_us",
        "first_purchase_us",
        "funnel_stage",
    ]
    # update mode re-emits a user's row per micro-batch that touches
    # the user; the LAST emission per user is the final folded state
    latest = {}
    for r in out.collect():
        latest[r.user_id] = tuple(r[c] for c in cols)
    expect = {r.user_id: tuple(r[c] for c in cols) for r in batch.collect()}
    assert latest == expect


def test_funnel_fn_retrocorrects_across_batches():
    """Multi-batch late-data semantics exercised directly: a LATE
    early view must lower first_view_us and can RAISE the funnel
    stage (a click that previously preceded every view becomes
    in-order)."""
    import pandas as pd

    from distributedmapreduce_spark.streaming.windows import _funnel_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame(
        {"event_type": ["click", "purchase"], "us": [100, 200]}
    )
    (out1,) = _funnel_fn((7,), [b1], st)
    assert out1.funnel_stage.iloc[0] == 0  # no view yet
    b2 = pd.DataFrame({"event_type": ["view"], "us": [50]})
    (out2,) = _funnel_fn((7,), [b2], st)
    assert (
        out2.first_view_us.iloc[0],
        out2.first_click_us.iloc[0],
        out2.first_purchase_us.iloc[0],
        out2.funnel_stage.iloc[0],
    ) == (50, 100, 200, 3)


def test_stream_clamped_balance_matches_batch(spark):
    """12th stream==batch parity: the streaming LITERAL Lindley
    recursion (replay-from-history state) must equal the batch
    reflection closed form b_t = S_t - min(0, min S_k) — two
    different formulations of the same nonlinear operator."""
    stream = SW.stream_events(spark, SF)
    out = SW.run_stream_to_table(
        SW.clamped_balance_stateful(stream), "t_clamp", "update"
    )
    latest = {
        r.user_id: (r.n_events, r.final_s, r.final_balance,
                    r.peak_balance)
        for r in out.collect()
    }
    batch = QUERIES["clamped_running_balance"](spark, SF)
    expect = {
        r.user_id: (r.n_events, r.final_s, r.final_balance,
                    r.peak_balance)
        for r in batch.collect()
    }
    assert latest == expect


def test_clamped_balance_fn_corrects_across_batches():
    """A late debit arriving in batch 2 must retro-correct the whole
    clamp chain (nonlinearity: the late event changes every later
    clamp, not just a window sum)."""
    import pandas as pd

    from distributedmapreduce_spark.streaming.windows import (
        _clamped_balance_fn,
    )

    st = FakeGroupState()
    b1 = pd.DataFrame(
        {"us": [10, 30], "event_id": [2, 3], "dc": [100, -40]}
    )
    out1 = next(_clamped_balance_fn((7,), [b1], st)).iloc[0]
    assert (out1.final_s, out1.final_balance, out1.peak_balance) == (
        60, 60, 100,
    )
    # batch 2: a LATE large debit at us=20 — replayed order is
    # +100, -500 (clamps to 0), -40 (clamps to 0): final 0, peak 100.
    # A window-sum mental model would give max(0, -440) the same, but
    # the peak and the clamp CHAIN only come out right via replay.
    b2 = pd.DataFrame({"us": [20], "event_id": [1], "dc": [-500]})
    out2 = next(_clamped_balance_fn((7,), [b2], st)).iloc[0]
    assert (out2.n_events, out2.final_s, out2.final_balance,
            out2.peak_balance) == (3, -440, 0, 100)


class FakeGroupState:
    """Minimal GroupState stand-in for driving the stateful fns
    directly: exists/get/update plus the watermark accessor the
    clamped-balance eviction reads."""

    def __init__(self, watermark_ms: int = 0):
        self.exists = False
        self._v = None
        self._wm = watermark_ms

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def getCurrentWatermarkMs(self):
        return self._wm


def test_clamped_balance_fn_folds_watermark_prefix_and_dedups():
    """State eviction + at-least-once guard (driver ADVICE r06): rows
    below the watermark fold into four base scalars (state no longer
    grows with history), a redelivered retained event_id is ignored,
    and the emitted summary equals the full-history replay
    throughout."""
    import pandas as pd

    from distributedmapreduce_spark.streaming.windows import (
        _clamped_balance_fn,
    )

    st = FakeGroupState(watermark_ms=0)
    b1 = pd.DataFrame(
        {"us": [10, 30], "event_id": [2, 3], "dc": [100, -40]}
    )
    next(_clamped_balance_fn((7,), [b1], st))
    # no watermark yet: whole tail retained, nothing folded
    assert st.get[0] == 0 and len(st.get[4]) == 2
    # watermark advances past us=30 (25 us == 0.025 ms -> use ms
    # granularity: us < wm_ms*1000); wm 1 ms = 1000 us covers both
    st._wm = 1
    b2 = pd.DataFrame(
        {"us": [2000, 20], "event_id": [5, 1], "dc": [70, -500]}
    )
    out2 = next(_clamped_balance_fn((7,), [b2], st)).iloc[0]
    # full-history replay: +100@10, -500@20 (clamp 0), -40@30
    # (clamp 0), +70@2000 -> final 70, peak 100, sum -370
    assert (out2.n_events, out2.final_s, out2.final_balance,
            out2.peak_balance) == (4, -370, 70, 100)
    # rows at us=10,20,30 are below the 1000-us watermark: folded
    bn, bs, bb, bp, us, eid, dc = st.get
    assert (bn, bs, bb, bp) == (3, -440, 0, 100)
    assert (list(us), list(eid), list(dc)) == ([2000], [5], [70])
    # redelivery of a RETAINED event is deduped by event_id; a fresh
    # event still lands, and the summary stays full-history-correct
    b3 = pd.DataFrame(
        {"us": [2000, 3000], "event_id": [5, 6], "dc": [70, 5]}
    )
    out3 = next(_clamped_balance_fn((7,), [b3], st)).iloc[0]
    assert (out3.n_events, out3.final_s, out3.final_balance,
            out3.peak_balance) == (5, -365, 75, 100)


def test_rolling_spend_fn_evicts_horizon_and_dedups():
    """Same bounded-state discipline as the clamped balance: rows
    older than watermark − 7d evict after their final emission, a
    redelivered retained event_id is ignored, and every emitted sum
    equals the full-history RANGE-frame value."""
    import pandas as pd

    from distributedmapreduce_spark.streaming.windows import (
        _ROLL_7D_US,
        _rolling_spend_fn,
    )

    day = 86_400 * 1_000_000
    st = FakeGroupState(watermark_ms=0)
    b1 = pd.DataFrame(
        {
            "us": [0, 3 * day, 6 * day],
            "event_id": [1, 2, 3],
            "cents": [100, 50, 25],
        }
    )
    out1 = next(_rolling_spend_fn((7,), [b1], st))
    assert dict(zip(out1.event_id, out1.spend_7d_c)) == {
        1: 100,
        2: 150,
        3: 175,
    }
    assert len(st.get[0]) == 3  # no watermark: everything retained
    # watermark advances to day 9: events below the watermark are
    # FINAL and stop re-emitting (their batch-1 values stand); rows
    # below 9d-7d=2d evict from state; the [2d, 9d) shadow stays as
    # contributors only; a redelivery of retained event 2 is deduped;
    # the new purchase at day 9 sums the full 7d window INCLUDING the
    # shadow contributors
    st._wm = (9 * day) // 1000
    b2 = pd.DataFrame(
        {"us": [3 * day, 9 * day], "event_id": [2, 4], "cents": [50, 10]}
    )
    out2 = next(_rolling_spend_fn((7,), [b2], st))
    assert dict(zip(out2.event_id, out2.spend_7d_c)) == {4: 85}
    us, eid, cents = st.get
    assert list(eid) == [2, 3, 4]  # event 1 (us=0 < 2d) evicted
    # event 1's redelivery after eviction would be dropped by the
    # watermark gate in Spark; batch 3 re-emits only the live event,
    # its sum unchanged over the retained shadow
    b3 = pd.DataFrame({"us": [], "event_id": [], "cents": []})
    out3 = next(_rolling_spend_fn((7,), [b3], st))
    assert dict(zip(out3.event_id, out3.spend_7d_c)) == {4: 85}


def test_stream_maintained_index_equals_batch(spark, tmp_path):
    """13th stream==batch parity (VERDICT r10 #6): the minhash index
    maintained CONTINUOUSLY — a foreachBatch sink over the kvjson
    upsert stream folds each micro-batch's new keys into the persisted
    artifact via operators/index_store.py::advance_index — must equal
    the monolithic batch signature build over the same documents,
    bit-exact, across TWO maintenance passes (initial load, then an
    upsert delta under the same checkpoint, so pass 2's micro-batch is
    exactly the new keys).  Also pins the exactly-once guard: replaying
    an already-applied batch id is a no-op."""
    import json
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        advance_index,
        read_stream_index,
        stream_index_last_batch,
        stream_index_path,
    )
    from distributedmapreduce_spark.plans.llm import _pmh_signatures
    from distributedmapreduce_spark.streaming.index_maint import (
        index_maintenance_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    ids = sorted(rows)
    base_ids, delta_ids = ids[: len(ids) // 2], ids[len(ids) // 2:]

    store = str(tmp_path / "docs.kv.json")
    ckpt = str(tmp_path / "ckpt")
    kind, params = "pmh-stream-test", ("parity", 8)
    token = f"{store}@{ckpt}"
    path = stream_index_path(kind, token, params)

    def _write_store(id_subset):
        # zero-padded keys: the kvjson watermark is lexicographic, so
        # later upserts must sort ABOVE already-emitted keys
        with open(store, "w", encoding="utf-8") as f:
            json.dump(
                {f"{i:08d}": {"text": rows[i]} for i in id_subset}, f
            )

    try:
        # night 1: the store holds the base half; batch 0 = all keys
        _write_store(base_ids)
        q = index_maintenance_stream(
            spark, store, ckpt,
            lambda d: _pmh_signatures(d), kind=kind, params=params,
        )
        q.awaitTermination()

        def canon_path():
            return sorted(
                (r.doc_id, tuple(sorted(r.hs)),
                 tuple(r[f"m{i}"] for i in range(8)))
                for r in read_stream_index(spark, path).collect()
            )

        def canon_df(df):
            return sorted(
                (r.doc_id, tuple(sorted(r.hs)),
                 tuple(r[f"m{i}"] for i in range(8)))
                for r in df.collect()
            )

        base_docs = docs.filter(F.col("doc_id").isin(base_ids))
        assert canon_path() == canon_df(_pmh_signatures(base_docs))

        # upsert the delta half; same checkpoint -> the next pass's
        # micro-batch is exactly the NEW keys above the watermark
        _write_store(ids)
        q2 = index_maintenance_stream(
            spark, store, ckpt,
            lambda d: _pmh_signatures(d), kind=kind, params=params,
        )
        q2.awaitTermination()
        assert canon_path() == canon_df(_pmh_signatures(docs))

        # exactly-once: replaying an applied batch id is a no-op —
        # the committed-batch watermark IS the directory listing, so
        # an unchanged listing proves no segment was written
        last = stream_index_last_batch(path)
        listing = sorted(os.listdir(path))
        advance_index(
            spark, kind, token,
            _pmh_signatures(docs.limit(5)),
            last, params=params,
        )
        assert sorted(os.listdir(path)) == listing
        assert canon_path() == canon_df(_pmh_signatures(docs))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_index_log_structure_and_crash_recovery(spark, tmp_path):
    """Crash-window pins for the log-structured stream index
    (VERDICT r11 #1/#6, ADVICE r11 items 1-3): the append path writes
    only delta-sized segments (never rewrites the base), a crash
    mid-write leaves an invisible .tmp that the next advance cleans,
    and a crash mid-compaction (compact renamed in, superseded
    segments not yet deleted) never double-counts because readers
    ignore segments at or below the compact watermark."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        advance_index,
        compact_stream_index,
        read_stream_index,
        stream_index_last_batch,
        stream_index_path,
    )

    kind, params = "logidx-test", ("crash", 1)
    token = str(tmp_path / "store")
    path = stream_index_path(kind, token, params)
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7).alias("sig")
    )
    canon = lambda: sorted(
        (r.doc_id, r.sig) for r in read_stream_index(spark, path).collect()
    )
    try:
        # three appends, no compaction: three segments, base untouched
        for b, (lo, hi) in enumerate([(0, 10), (10, 15), (15, 18)]):
            advance_index(spark, kind, token, mk(lo, hi), b,
                          params=params, compact_every=100)
        segs = sorted(
            n for n in os.listdir(path) if n.startswith("seg-")
        )
        assert len(segs) == 3
        assert canon() == [(i, i * 7) for i in range(18)]
        # O(delta) shape: the batch-1 segment holds 5 rows, not 15
        seg1 = os.path.join(path, segs[1])
        assert spark.read.parquet(seg1).count() == 5

        # crash mid-write: a stranded .tmp is invisible to readers
        # and the watermark, and the next advance sweeps it
        stranded = os.path.join(path, ".tmp-s99-dead")
        mk(90, 95).write.mode("overwrite").parquet(stranded)
        assert stream_index_last_batch(path) == 2
        assert canon() == [(i, i * 7) for i in range(18)]
        advance_index(spark, kind, token, mk(18, 20), 3,
                      params=params, compact_every=100)
        assert not os.path.exists(stranded)
        assert canon() == [(i, i * 7) for i in range(20)]

        # crash mid-compaction: rename landed, superseded segment
        # deletes did not.  Resurrect a covered segment and assert
        # readers still count each row once, then compaction cleans it.
        compact_stream_index(spark, path)
        children = sorted(os.listdir(path))
        assert children == ["compact-" + "0" * 19 + "3"]
        ghost = os.path.join(path, "seg-" + "0" * 19 + "2")
        mk(15, 18).write.mode("overwrite").parquet(ghost)
        assert canon() == [(i, i * 7) for i in range(20)]  # ghost ignored
        advance_index(spark, kind, token, mk(20, 22), 4,
                      params=params, compact_every=100)
        assert not os.path.exists(ghost)  # lazily swept
        assert canon() == [(i, i * 7) for i in range(22)]

        # replay below the compact watermark is a no-op
        listing = sorted(os.listdir(path))
        advance_index(spark, kind, token, mk(0, 5), 3, params=params)
        assert sorted(os.listdir(path)) == listing

        # cadence: compact_every=2 folds the log back to one child
        advance_index(spark, kind, token, mk(22, 23), 5,
                      params=params, compact_every=2)
        assert [n for n in sorted(os.listdir(path))] == [
            "compact-" + "0" * 19 + "5"
        ]
        assert canon() == [(i, i * 7) for i in range(23)]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_maintained_partitioned_index_equals_batch(spark, tmp_path):
    """14th stream==batch parity: the continuously-maintained index
    with PARTITIONED segments (band = doc_id % 4, the scale layout
    that gives banded searches partition pruning) equals the
    monolithic batch build over the same documents, bit-exact, across
    two maintenance passes under one checkpoint — partitioning is a
    layout choice, never a semantics change."""
    import json
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        read_stream_index,
        stream_index_path,
    )
    from distributedmapreduce_spark.plans.llm import _pmh_signatures
    from distributedmapreduce_spark.streaming.index_maint import (
        index_maintenance_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    ids = sorted(rows)
    base_ids = ids[: len(ids) // 2]

    store = str(tmp_path / "docs.kv.json")
    ckpt = str(tmp_path / "ckpt")
    kind, params = "pmh-part-test", ("parity-part", 8)
    path = stream_index_path(kind, f"{store}@{ckpt}", params)

    def sig(d):
        return _pmh_signatures(d).withColumn(
            "band", (F.col("doc_id") % 4).cast("int")
        )

    def _write_store(id_subset):
        with open(store, "w", encoding="utf-8") as f:
            json.dump(
                {f"{i:08d}": {"text": rows[i]} for i in id_subset}, f
            )

    def canon(df):
        return sorted(
            (r.doc_id, r.band, tuple(sorted(r.hs)),
             tuple(r[f"m{i}"] for i in range(8)))
            for r in df.collect()
        )

    try:
        for id_set in (base_ids, ids):  # night 1 load, night 2 upsert
            _write_store(id_set)
            q = index_maintenance_stream(
                spark, store, ckpt, sig, kind=kind, params=params,
                partition_by="band",
            )
            q.awaitTermination()
            subset = docs.filter(F.col("doc_id").isin(list(id_set)))
            assert canon(read_stream_index(spark, path)) == canon(
                sig(subset)
            )
        # the partition layout is real: band dirs exist inside segments
        seg_children = [
            n for s in os.listdir(path) if s.startswith(("seg-", "compact-"))
            for n in os.listdir(os.path.join(path, s))
        ]
        assert any(n.startswith("band=") for n in seg_children)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_index_partitioned_segments_prune(spark, tmp_path):
    """VERDICT r11 #1's partitioning clause: segments (and
    compactions) can be partitioned on a stable column, and a search
    filtering on it prunes inside EVERY generation of the log — the
    executed plan carries the predicate as a PartitionFilter, and the
    scan reads only the matching partition's files."""
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        advance_index,
        read_stream_index,
        stream_index_path,
    )

    kind, params = "partidx-test", ("prune", 1)
    token = str(tmp_path / "store")
    path = stream_index_path(kind, token, params)
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id AS doc_id", "id * 7 AS sig", "CAST(id % 4 AS INT) AS band"
    )
    try:
        # two appends then a forced compaction + one more segment, all
        # partitioned: the live set mixes a compact and a segment
        advance_index(spark, kind, token, mk(0, 40), 0,
                      params=params, compact_every=100, partition_by="band")
        advance_index(spark, kind, token, mk(40, 60), 1,
                      params=params, compact_every=2, partition_by="band")
        advance_index(spark, kind, token, mk(60, 70), 2,
                      params=params, compact_every=100, partition_by="band")
        # an EMPTY partitioned delta (only _SUCCESS, no part files)
        # must advance the watermark but never wedge readers
        from distributedmapreduce_spark.operators.index_store import (
            stream_index_last_batch,
        )

        advance_index(spark, kind, token, mk(0, 10).filter("doc_id < 0"),
                      3, params=params, compact_every=100,
                      partition_by="band")
        assert stream_index_last_batch(path) == 3  # replay of 3 = no-op

        df = read_stream_index(spark, path)
        assert df.count() == 70
        hit = df.filter(F.col("band") == 1)
        assert sorted(r.doc_id for r in hit.collect()) == [
            i for i in range(70) if i % 4 == 1
        ]
        # plan-level proof: EVERY union branch (the compact + the
        # later segment) carries the predicate as a PartitionFilter
        plan = hit._jdf.queryExecution().executedPlan().toString()
        branches = [
            seg for seg in plan.split("FileScan")[1:]
            if "PartitionFilters" in seg
        ]
        assert len(branches) == 2, plan
        assert all(
            "band" in seg.split("PartitionFilters", 1)[1].split("]", 1)[0]
            for seg in branches
        ), plan
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_index_path_token_separation():
    """The stream artifact key binds store + checkpoint identity: a
    different checkpoint (whose batch 0 re-reads the whole store) can
    never resolve to an existing artifact and double-count."""
    from distributedmapreduce_spark.operators.index_store import (
        stream_index_path,
    )

    a = stream_index_path("k", "/s/store.json@/c/ckpt1", ("p", 8))
    b = stream_index_path("k", "/s/store.json@/c/ckpt2", ("p", 8))
    c = stream_index_path("k", "/s/store.json@/c/ckpt1", ("p", 9))
    assert len({a, b, c}) == 3


def test_stream_maintained_index_upsert_delete_equals_batch(
    spark, tmp_path
):
    """15th stream==batch parity (VERDICT r12 #1): the maintained
    index must honor the store's OWN last-writer-wins semantics
    (reference S15, database_server.py:88-102) — re-upserted keys
    (changed values), deleted keys, and new keys all flow through the
    kvjson CDC stream into versioned segments with tombstones, and
    the resolved read equals the monolithic batch build over the
    store's FINAL state, bit-exact.  Also pins: a no-change pass
    appends nothing, and a forced compaction (which physically
    applies LWW and garbage-collects tombstones) preserves equality."""
    import json
    import os
    import shutil

    from distributedmapreduce_spark.operators.index_store import (
        compact_stream_index,
        read_stream_index,
        stream_index_last_batch,
        stream_index_path,
    )
    from distributedmapreduce_spark.plans.llm import _pmh_signatures
    from distributedmapreduce_spark.streaming.index_maint import (
        index_maintenance_stream,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = {r.doc_id: r.text for r in docs.collect()}
    ids = sorted(rows)
    assert len(ids) >= 12

    store = str(tmp_path / "docs.kv.json")
    ckpt = str(tmp_path / "ckpt")
    kind, params = "pmh-upsert-test", ("parity-upsert", 8)
    token = f"{store}@{ckpt}#cdc"
    path = stream_index_path(kind, token, params)

    def _write_store(state: dict) -> None:
        with open(store, "w", encoding="utf-8") as f:
            json.dump(
                {f"{i:08d}": {"text": t} for i, t in state.items()}, f
            )

    def _batch_build(state: dict):
        return _pmh_signatures(
            spark.createDataFrame(
                sorted(state.items()), "doc_id long, text string"
            )
        )

    def canon(df):
        return sorted(
            (r.doc_id, tuple(sorted(r.hs)),
             tuple(r[f"m{i}"] for i in range(8)))
            for r in df.collect()
        )

    def maintained():
        return read_stream_index(spark, path, key_col="doc_id")

    try:
        # state 1: the first 2/3 of the corpus
        state = {i: rows[i] for i in ids[: 2 * len(ids) // 3]}
        _write_store(state)
        q = index_maintenance_stream(
            spark, store, ckpt, _pmh_signatures, kind=kind,
            params=params, mode="upsert",
        )
        q.awaitTermination()
        assert canon(maintained()) == canon(_batch_build(state))

        # state 2: UPDATE two existing keys (changed text), DELETE
        # two keys, ADD the held-out tail — the three change kinds the
        # key high-watermark could never re-deliver.  One of the
        # updated keys sorts BELOW every existing key.
        held_out = ids[2 * len(ids) // 3:]
        present = sorted(state)
        state[present[0]] = state[present[0]] + " revised edition"
        state[present[1]] = "an entirely different document"
        del state[present[2]], state[present[-1]]
        for i in held_out:
            state[i] = rows[i]
        _write_store(state)
        q2 = index_maintenance_stream(
            spark, store, ckpt, _pmh_signatures, kind=kind,
            params=params, mode="upsert",
        )
        q2.awaitTermination()
        assert canon(maintained()) == canon(_batch_build(state))

        # no-change pass: same store content -> the CDC diff is empty,
        # no batch runs, the artifact listing is untouched
        last = stream_index_last_batch(path)
        listing = sorted(os.listdir(path))
        q3 = index_maintenance_stream(
            spark, store, ckpt, _pmh_signatures, kind=kind,
            params=params, mode="upsert",
        )
        q3.awaitTermination()
        assert sorted(os.listdir(path)) == listing
        assert stream_index_last_batch(path) == last

        # forced compaction physically applies LWW + drops tombstones
        # (the upsert log's GC) without changing the resolved row set
        compact_stream_index(spark, path, key_col="doc_id")
        children = sorted(os.listdir(path))
        assert len(children) == 1 and children[0].startswith("compact-")
        assert canon(maintained()) == canon(_batch_build(state))
        # deleted keys are physically gone from the compacted file,
        # not just filtered at read (tombstone GC is real)
        raw = spark.read.parquet(os.path.join(path, children[0]))
        assert raw.filter("__del").count() == 0
        assert raw.count() == len(state)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_kvjson_cdc_reader_offsets_and_replay(tmp_path):
    """Driver-side pins for the kvjson CDC stream reader: monotone
    revision offsets, change detection for update/delete/insert,
    deterministic (start, end] replay from the persisted delta files
    (the Structured Streaming recovery contract), empty-poll offset
    stability, and sidecar pruning on commit."""
    import json

    from distributedmapreduce_spark.sources.kvjson import (
        KVJsonCDCStreamReader,
    )

    store = str(tmp_path / "s.json")

    def write(obj):
        with open(store, "w", encoding="utf-8") as f:
            json.dump(obj, f)

    write({"a": {"text": "alpha"}, "b": {"text": "beta"}})
    r = KVJsonCDCStreamReader({"path": store})
    assert r.initialOffset() == {"rev": 0}

    rows, end = r.read({"rev": 0})
    rows = list(rows)
    assert end == {"rev": 1}
    assert rows == [
        ("a", json.dumps({"text": "alpha"}, sort_keys=True), "u"),
        ("b", json.dumps({"text": "beta"}, sort_keys=True), "u"),
    ]

    # no change -> same offset, no rows, no new sidecars
    rows2, end2 = r.read(end)
    assert list(rows2) == [] and end2 == {"rev": 1}

    # update a, delete b, insert c — all three redelivered
    write({"a": {"text": "alpha v2"}, "c": {"text": "gamma"}})
    rows3, end3 = r.read(end)
    rows3 = list(rows3)
    assert end3 == {"rev": 2}
    assert rows3 == [
        ("a", json.dumps({"text": "alpha v2"}, sort_keys=True), "u"),
        ("c", json.dumps({"text": "gamma"}, sort_keys=True), "u"),
        ("b", None, "d"),
    ]

    # replay is bit-identical even after the store mutates again
    write({"z": {"text": "omega"}})
    assert list(r.readBetweenOffsets(end, end3)) == rows3
    assert list(r.readBetweenOffsets({"rev": 0}, end)) == rows

    # a stored JSON null is the STRING "null" (op 'u'), never SQL NULL
    # — deletes alone carry value=None
    write({"z": None})
    rows4, end4 = r.read(end3)
    rows4 = list(rows4)
    assert ("z", "null", "u") in rows4
    assert ("a", None, "d") in rows4 and ("c", None, "d") in rows4

    # commit prunes sidecars strictly below the committed revision
    import os

    r.commit(end4)
    left = sorted(os.listdir(r.changelog))
    assert all(
        int(n.split("-")[1].split(".")[0]) >= end4["rev"] for n in left
    )


def test_stream_index_refuses_legacy_layout(spark, tmp_path):
    """ADVICE r12 item 1: a pre-log-structured artifact (top-level
    parquet _SUCCESS) must fail loudly, never read as an empty log —
    silently burying the legacy rows under new segments would be
    data loss with no error."""
    import pytest as _pytest

    from distributedmapreduce_spark.operators.index_store import (
        read_stream_index,
        stream_index_last_batch,
    )

    legacy = str(tmp_path / "legacy-artifact")
    spark.range(5).write.mode("overwrite").parquet(legacy)
    with _pytest.raises(ValueError, match="legacy"):
        stream_index_last_batch(legacy)
    with _pytest.raises(ValueError, match="legacy"):
        read_stream_index(spark, legacy)
