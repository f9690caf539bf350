"""Structural properties of the round-6 battery #3 that the oracle
hash can't see: funnel ordering, rolling-window lower bounds, cohort
accounting identities, quantizer error bounds, and hash-min label
validity — each checked from the query OUTPUT so they hold at any SF.
"""

from __future__ import annotations

from distributedmapreduce_spark.plans.core import registry

SF = "/root/testdata/sf0.01"


def _q(name, spark):
    return registry()[name].fn(spark, SF)


def test_funnel_is_monotone(spark):
    """Each funnel stage can only lose users, and stage order is the
    causal one."""
    rows = {r.stage: r for r in _q("funnel_conversion", spark).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].event_type == "view"
    assert rows[1].n_users >= rows[2].n_users >= rows[3].n_users >= 0
    assert rows[3].n_users > 0  # fixture data actually converts


def test_retention_age0_is_cohort_size(spark):
    """Σ over cohorts of the age-0 cell = total purchasing users, and
    no age-k cell exceeds its cohort's age-0 cell."""
    rows = _q("retention_cohorts_weekly", spark).collect()
    age0 = {r.cohort_week: r.n_users for r in rows if r.age_weeks == 0}
    for r in rows:
        assert r.age_weeks >= 0
        assert r.n_users <= age0[r.cohort_week]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = (
        ev.filter("event_type = 'purchase'").select("user_id").distinct()
    ).count()
    assert sum(age0.values()) == n_users


def test_rolling_spend_lower_bound(spark):
    """The trailing-7d sum at a purchase includes at least that
    purchase itself (positive cents fixture -> strictly positive)."""
    out = _q("rolling_7d_user_spend", spark)
    assert out.filter("spend_7d_c <= 0").count() == 0
    # per-user max rolling sum never exceeds the user's total spend
    ev = spark.read.parquet(f"{SF}/events.parquet")
    tot = (
        ev.filter("event_type = 'purchase'")
        .selectExpr(
            "user_id", "CAST(round(value * 100) AS LONG) AS cents"
        )
        .groupBy("user_id")
        .sum("cents")
        .withColumnRenamed("sum(cents)", "tot")
    )
    joined = out.groupBy("user_id").max("spend_7d_c").join(tot, "user_id")
    assert joined.filter("`max(spend_7d_c)` > tot").count() == 0


def test_quantizer_error_bound(spark):
    """256-level min/max quantization error is bounded by one bin
    width: |err| <= ceil((mx-mn)/255)."""
    for r in _q("embedding_int8_quantize", spark).collect():
        binw = (r.mx_e7 - r.mn_e7 + 254) // 255
        assert 0 <= r.max_abs_err_e7 <= max(binw, 0)
        assert r.sum_abs_err_e7 >= r.max_abs_err_e7


def test_hashmin_components_valid(spark):
    """Hash-min labels: every component's id IS its minimum member
    (label = K-hop min and the census reports min_member), and
    censuses of CC vs LPA cover the same node total."""
    cc = _q("connected_components_hashmin", spark).collect()
    for r in cc:
        assert r.component == r.min_member
        assert r.n_members >= 1
    lpa = _q("label_propagation_communities", spark).collect()
    assert sum(r.n_members for r in cc) == sum(r.n_members for r in lpa)
