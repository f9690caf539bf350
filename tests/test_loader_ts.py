"""Engine-version robustness of the events.ts loader (VERDICT r03 §1/§3).

pyspark < 4.1 surfaces parquet TIMESTAMP(NANOS) as nanos-since-epoch
LongType (via spark.sql.legacy.parquet.nanosAsLong); pyspark >= 4.1
reads it natively as TIMESTAMP_NTZ.  sources/testdata.py must yield
the SAME UTC-instant TimestampType under both modes — every
unix_micros / withWatermark / window call site depends on it.
"""

from __future__ import annotations

import pathlib

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from distributedmapreduce_spark.sources.testdata import load_table
from distributedmapreduce_spark.streaming.windows import stream_events

from .conftest import SF_DIR

PKG = pathlib.Path(__file__).resolve().parents[1] / "distributedmapreduce_spark"

# the only two files allowed to read events.parquet directly: the
# batch loader and the streaming source (both normalize ts)
TS_CHOKE_POINTS = {"sources/testdata.py", "streaming/windows.py"}


def test_batch_events_ts_is_timestamp(spark):
    df = load_table(spark, "events", SF_DIR)
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema["ts"]


def test_stream_events_ts_is_timestamp(spark):
    sdf = stream_events(spark, SF_DIR)
    assert isinstance(sdf.schema["ts"].dataType, TimestampType), sdf.schema["ts"]
    # withWatermark is the canary: it throws EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE if normalization regressed to NTZ
    sdf.withWatermark("ts", "1 hour")


def test_unix_micros_matches_duckdb_epoch_us(spark):
    """The loaded instants must agree byte-for-byte with the oracle's
    µs-pinned relation (plans/core.py EVENTS_US) — same truncation,
    same UTC interpretation, independent of reading mode."""
    got = {
        r.event_id: r.us
        for r in load_table(spark, "events", SF_DIR)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(50)
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""
            SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY event_id LIMIT 50
            """
        ).fetchall()
    )
    con.close()
    assert got == want


def test_no_plan_reads_events_parquet_directly():
    """Lint: plans/operators must get events via load_table /
    stream_events so ts normalization cannot be bypassed — a direct
    read would hand unix_micros/withWatermark a raw NTZ (or long)
    column under some engine version."""
    offenders = []
    for py in PKG.rglob("*.py"):
        rel = py.relative_to(PKG).as_posix()
        if rel in TS_CHOKE_POINTS:
            continue
        for ln in py.read_text().splitlines():
            s = ln.strip()
            # code lines only (skip comments/docs that merely mention it)
            if "events.parquet" in s and not s.startswith("#") and "(" in s:
                offenders.append(f"{rel}: {s}")
    assert not offenders, f"direct events.parquet reads outside choke points: {offenders}"


def test_unix_micros_independent_of_session_timezone(spark):
    """ADVICE r04: the NTZ branch must interpret the wall clock as UTC
    under ANY caller session timezone — the engine promises to work
    under sessions it didn't build (e.g. the driver's).  A naive
    NTZ→TIMESTAMP cast shifts every instant by the session-tz offset."""
    tz_key = "spark.sql.session.timeZone"
    orig = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc = {
            r.event_id: r.us
            for r in load_table(spark, "events", SF_DIR)
            .select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .limit(50)
            .collect()
        }
        spark.conf.set(tz_key, "America/Los_Angeles")
        la = {
            r.event_id: r.us
            for r in load_table(spark, "events", SF_DIR)
            .select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .limit(50)
            .collect()
        }
    finally:
        spark.conf.set(tz_key, orig)
    assert utc == la


@pytest.mark.parametrize(
    "qname",
    ["sessionization", "range_join_event_pairs", "window_lag_event_gaps"],
)
def test_ntz_regression_queries_analyze(spark, qname):
    """The three r03 NTZ-red queries must at least pass Catalyst
    analysis (DATATYPE_MISMATCH on unix_micros(NTZ) throws here)."""
    from distributedmapreduce_spark.plans.core import registry

    df = registry()[qname].fn(spark, SF_DIR)
    df.schema  # forces analysis
