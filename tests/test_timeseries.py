"""Invariant tests for the timeseries battery (plans/timeseries.py):
algebraic contracts that hold at any scale, complementing the DuckDB
hash oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributedmapreduce_spark.plans.core import registry, t
from tests.conftest import SF_DIR_001 as SF


def _q(name, spark):
    return registry()[name].fn(spark, SF)


def test_ohlc_bounds_and_volume_conservation(spark):
    """low <= open, close <= high per candle; candle volumes sum to
    the event count (every event lands in exactly one candle)."""
    rows = _q("ohlc_resample", spark).collect()
    assert rows
    for r in rows:
        assert r["low_c"] <= r["open_c"] <= r["high_c"]
        assert r["low_c"] <= r["close_c"] <= r["high_c"]
        assert r["n"] >= 1
    total = sum(r["n"] for r in rows)
    n_events = t(spark, SF, "events").count()
    assert total == n_events


def test_twap_within_value_envelope(spark):
    """The time-weighted average is a convex combination of observed
    values, so it must lie within each type's [min, max] cents."""
    rows = {r["event_type"]: r for r in _q("time_weighted_average", spark).collect()}
    env = {
        r["event_type"]: r
        for r in t(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.min(F.round(F.col("value") * 100).cast("long")).alias("lo"),
            F.max(F.round(F.col("value") * 100).cast("long")).alias("hi"),
        )
        .collect()
    }
    assert set(rows) == set(env)
    for ty, r in rows.items():
        assert env[ty]["lo"] <= r["twap_cents"] <= env[ty]["hi"]
        assert 0 <= r["twap_frac_e6"] < 1_000_000
        assert r["sum_dur_us"] > 0


def test_interval_overlap_positive_and_bounded(spark):
    """Every reported overlap is strictly positive (half-open
    intervals that merely touch do NOT overlap) and cannot exceed the
    max interval length (3599 s)."""
    rows = _q("interval_overlap_join", spark).collect()
    assert rows
    for r in rows:
        assert 0 < r["overlap_us"] <= 3599 * 1_000_000
    # pair uniqueness: the bucket-join dedup worked
    pairs = [(r["click_id"], r["view_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_seasonal_backtest_mae_consistency(spark):
    """MAE is the integer quotient of the error sum; pair counts are
    bounded by (buckets - 24) per type."""
    rows = _q("seasonal_naive_backtest", spark).collect()
    assert rows
    for r in rows:
        assert r["mae_c"] == r["sum_abs_err_c"] // r["n_hours"]
        assert r["n_hours"] > 0


def test_cusum_peak_is_positive_and_in_range(spark):
    """A series with any variation has a strictly positive scaled
    CUSUM peak; the reported bucket exists in the series."""
    rows = {r["event_type"]: r for r in _q("cusum_changepoint", spark).collect()}
    hb = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in t(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.min(F.expr("unix_micros(ts) div 3600000000")).alias("lo"),
            F.max(F.expr("unix_micros(ts) div 3600000000")).alias("hi"),
        )
        .collect()
    }
    assert set(rows) == set(hb)
    for ty, r in rows.items():
        assert r["max_cusum_nb"] > 0
        assert hb[ty][0] <= r["at_hour_bucket"] <= hb[ty][1]


def test_event_queries_session_tz_independent(spark):
    """End-to-end insurance on the ADVICE-r04 class: the new
    event-time queries must produce IDENTICAL results under a non-UTC
    session timezone (the driver's session is not ours to configure;
    the loader's NTZ normalization is the choke point)."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        for name in ("interval_max_concurrency", "ohlc_resample",
                     "session_top_paths"):
            a = sorted(map(tuple, registry()[name].fn(spark, SF).collect()))
            b = sorted(map(tuple, registry()[name].fn(s2, SF).collect()))
            assert a == b, name
    finally:
        s2.conf.unset("spark.sql.session.timeZone")
