"""Invariant tests for the round-5 analytics battery #2
(plans/analytics2.py).  The DuckDB oracles pin cross-engine value
equality; these pin the *algebraic* contracts that hold at any scale —
conservation, partition-of-unity, symmetry — the properties the 100 TB
operator must keep when the oracle can no longer run.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from distributedmapreduce_spark.plans.core import registry
from tests.conftest import SF_DIR_001 as SF


def _q(name, spark):
    return registry()[name].fn(spark, SF)


def test_attribution_conserves_revenue(spark):
    """Linear attribution is a PARTITION of purchase revenue: the
    attributed cents across all hour buckets (incl. the NULL bucket)
    must equal total purchase cents exactly — integer split with
    remainder-to-last-touch guarantees zero dust."""
    out = _q("attribution_linear_touch", spark)
    attributed = out.agg(F.sum("attributed_cents")).collect()[0][0]
    from distributedmapreduce_spark.plans.core import t

    total = (
        t(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")))
        .collect()[0][0]
    )
    assert attributed == total


def test_cuped_two_arms_and_adjustment_shrinks_gap(spark):
    """Both arms present; CUPED leaves the POOLED mean invariant
    (Σ n_a·(X̄_a - X̄) = 0 up to per-arm rounding), so the adjusted
    means stay within the raw means' envelope ± theta·covariate
    spread.  We pin the cheap part: exactly 2 arms, adjusted means
    finite, and each |adj - raw| bounded by the cross-arm raw spread
    (theta shifts arms toward each other, never past the envelope on
    near-balanced assignment)."""
    rows = _q("ab_test_cuped", spark).collect()
    assert sorted(r["arm"] for r in rows) == [0, 1]
    raw = {r["arm"]: r["mean_y_e4"] for r in rows}
    adj = {r["arm"]: r["mean_y_adj_e4"] for r in rows}
    spread = abs(raw[0] - raw[1]) + 2  # +2 absorbs floor rounding
    for a in (0, 1):
        assert abs(adj[a] - raw[a]) <= spread


def test_interval_concurrency_bounds(spark):
    """Peak concurrency is >= 1 (every type has at least one event =
    one open interval) and <= the type's event count; the peak instant
    lies inside the data's time range extended by the max duration."""
    out = {r["event_type"]: r for r in _q("interval_max_concurrency", spark).collect()}
    from distributedmapreduce_spark.plans.core import t

    counts = {
        r["event_type"]: r["n"]
        for r in t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(counts)
    for ty, r in out.items():
        assert 1 <= r["max_concurrent"] <= counts[ty]


def test_triangle_counts_consistent(spark):
    """Σ per-node participation = 3 · (number of triangles), and every
    participating node appears in the rare-part co-purchase edge list."""
    rows = _q("triangle_count_copurchase", spark).collect()
    total = sum(r["n_triangles"] for r in rows)
    assert total > 0 and total % 3 == 0


def test_itempairs_support_and_lift_sane(spark):
    """Canonical ordering (p1 < p2), support >= 2, confidence <= 1 (in
    1e-6 ticks), and lift consistent with its integer formula."""
    rows = _q("frequent_itempairs", spark).limit(500).collect()
    assert rows
    for r in rows:
        assert r["p1"] < r["p2"]
        assert r["support"] >= 2
        assert 0 < r["conf_p1_e6"] <= 1_000_000
        assert r["lift_e6"] > 0


def test_cms_overestimates_and_is_tight_somewhere(spark):
    """The Count-Min guarantee: every estimate >= the exact count; and
    with W=16 over a 31-word vocab at least one bucket collides, so at
    least one estimate strictly overestimates (the sketch is doing
    approximate work, not acting as an exact table)."""
    rows = _q("count_min_heavy_estimates", spark).collect()
    assert rows
    assert all(r["cms_n"] >= r["exact_n"] for r in rows)
    assert any(r["cms_n"] > r["exact_n"] for r in rows)


def test_rfm_scores_partition_users_into_thirds(spark):
    """Every score in 1..3; each score value covers ~n/3 users (exact
    rank arithmetic: the three classes differ in size by at most 1)."""
    rows = _q("rfm_user_segments", spark).collect()
    n = len(rows)
    assert n > 0
    for dim in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            assert 1 <= r[dim] <= 3
            sizes[r[dim]] = sizes.get(r[dim], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = sorted(_q("vocab_coverage_curve", spark).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [5, 10, 20]
    cov = [r["coverage_e6"] for r in rows]
    assert cov == sorted(cov)
    assert all(0 < c <= 1_000_000 for c in cov)
    assert all(r["topk_tokens"] <= r["total_tokens"] for r in rows)


def test_interval_segmented_equals_plain(spark):
    """The grouped two-level prefix-sum sweep must reproduce the plain
    per-type-window sweep EXACTLY — same peak, same first instant —
    at every bucket boundary regime the data exercises."""
    plain = {
        (r["event_type"], r["max_concurrent"], r["at_us"])
        for r in _q("interval_max_concurrency", spark).collect()
    }
    seg = {
        (r["event_type"], r["max_concurrent"], r["at_us"])
        for r in _q("interval_max_concurrency_segmented", spark).collect()
    }
    assert plain == seg


def test_battery2_survives_empty_inputs(spark, tmp_path):
    """Degenerate-regime lock: every battery-#2 query must return a
    well-defined EMPTY result (not crash, not NaN rows) when its input
    tables have zero rows — the div-by-zero / NULL-aggregate paths
    (CUPED's guarded theta, the midpoint NULL, empty vocab) all
    execute here."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    src = "/root/testdata/sf0.001"
    for tbl in ("events", "lineitem", "orders", "documents"):
        schema = pq.read_schema(f"{src}/{tbl}.parquet")
        pq.write_table(schema.empty_table(), str(tmp_path / f"{tbl}.parquet"))

    for name in (
        "frequent_itempairs",
        "interval_max_concurrency",
        "interval_max_concurrency_segmented",
        "triangle_count_copurchase",
        "ab_test_cuped",
        "attribution_linear_touch",
        "count_min_heavy_estimates",
        "rfm_user_segments",
        "vocab_coverage_curve",
        "grouped_map_streaks",
    ):
        out = registry()[name].fn(spark, str(tmp_path)).collect()
        assert out == [], (name, out)


def test_hll_portable_estimate_accuracy(spark):
    """Evaluate the HLL estimator on the bit-portable sketch state:
    alpha_64 * m^2 * 2^27 / s_pow (+ small-range linear-counting
    correction), and require the estimate within 3 standard errors
    (3 * 1.04/sqrt(64) ~ 39%) of the exact distinct count."""
    import math

    r = _q("approx_distinct_hll_portable", spark).collect()[0]
    m, s_pow, v_zero, exact = r["m"], r["s_pow"], r["v_zero"], r["exact_nd"]
    assert m == 64 and s_pow > 0
    est = 0.709 * m * m * (2 ** 27) / s_pow
    if est <= 2.5 * m and v_zero > 0:
        est = m * math.log(m / v_zero)
    assert abs(est - exact) / exact <= 3 * 1.04 / math.sqrt(m), (est, exact)


def test_decile_gains_monotone_and_balanced(spark):
    """Cumulative share is strictly increasing to exactly 1e6 at
    decile 10; deciles are equal-frequency within 1 user; revenue per
    decile is non-increasing (ranked by spend)."""
    rows = sorted(_q("decile_lift_gains", spark).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cs = [r["cum_share_e6"] for r in rows]
    assert cs == sorted(cs) and cs[-1] == 1_000_000
    sizes = [r["n_users"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    revs = [r["rev_c"] for r in rows]
    assert revs == sorted(revs, reverse=True)
