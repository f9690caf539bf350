"""Round-6 analytics battery #9: inequality/concentration metrics,
exact nonparametric two-sample tests, and per-user burstiness.

Same portability discipline as the earlier batteries: money is BIGINT
cents, every published ratio is an integer tick division or a single
correctly-rounded IEEE-754 division of exactly-representable int64
values, and sums that feed publications are audited for int64
headroom at the 100x replica.  Reference parity note: the reference
engine (ParitoshSabade/DistributedMapReduce) exposes only
map/reduce word-count jobs (mapper_word_count.py:11-35); these
queries are the extension surface SURVEY.md §2.2 declares for a
training-data / analytics deployment at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .core import EVENTS_US, query, t

_KS_G0 = "1-URGENT"
_KS_G1 = "5-LOW"
_KS_BKT_C = 1_000_000  # $10k value buckets for the two-phase cumsum
_DAY_US = 86_400_000_000


@query(
    "gini_order_concentration",
    oracle="""
    WITH oc AS (
      SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    cx AS (
      SELECT c_nationkey AS nation, coalesce(x, 0) AS x
      FROM customer LEFT JOIN oc ON oc.ck = c_custkey),
    h AS (
      SELECT nation, x, CAST(count(*) AS BIGINT) AS c
      FROM cx GROUP BY 1, 2),
    w AS (
      SELECT nation, x, c,
             coalesce(sum(c) OVER (PARTITION BY nation ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS strt
      FROM h),
    a AS (
      SELECT nation,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(x * c) AS BIGINT) AS s,
             CAST(sum(x * (2 * strt * c + c * (c + 1))) AS BIGINT)
               AS two_ix
      FROM w GROUP BY 1)
    SELECT CAST(nation AS BIGINT) AS nation,
           n AS n_customers, s AS total_orders,
           (two_ix - (n + 1) * s) * 1000000 // (n * s) AS gini_e6
    FROM a WHERE s > 0
    """,
)
def gini_order_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Gini coefficient of per-customer order counts, per
    nation — the inequality/concentration staple (is activity spread
    evenly or owned by a few whales?).  Zero-order customers are
    included via the left join, so the coefficient reflects the whole
    population.  Uses the sorted-index identity
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx); because swapping equal
    values never changes Σ i·x_i, ties need no deterministic
    ordering.

    Scale: corpus-sized work is one orders groupBy and one customer
    join; the rank structure is computed on the (nation, count) VALUE
    HISTOGRAM — for a discrete-domain variable the block of ranks a
    value occupies is contiguous, so Σ i·x_i collapses to
    v·(2·start·c + c·(c+1)) per histogram row and the only window
    runs over the histogram (≤ distinct-count rows per nation), never
    the population.  Int64: two_ix ≤ 2·n·S ≈ 7.2e10 at the 100x
    replica; ×1e6 = 7.2e16, 128× inside int64 (drop to 1e4 ticks
    past ~1000x)."""
    oc = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    cx = (
        t(spark, sf, "customer")
        .select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nation"),
        )
        .join(oc, "ck", "left")
        .select("nation", F.coalesce("x", F.lit(0)).alias("x"))
    )
    h = cx.groupBy("nation", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wb = (
        W.partitionBy("nation")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w = h.withColumn(
        "strt", F.coalesce(F.sum("c").over(wb), F.lit(0))
    )
    a = w.groupBy("nation").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("c")).cast("long").alias("s"),
        F.sum(
            F.col("x")
            * (
                2 * F.col("strt") * F.col("c")
                + F.col("c") * (F.col("c") + 1)
            )
        )
        .cast("long")
        .alias("two_ix"),
    )
    return a.filter(F.col("s") > 0).select(
        F.col("nation").cast("long").alias("nation"),
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_orders"),
        F.expr(
            "(two_ix - (n + 1) * s) * 1000000 div (n * s)"
        ).alias("gini_e6"),
    )


def _two_group_cdf(spark: SparkSession, sf: str) -> DataFrame:
    """Shared machinery for the exact two-sample tests: the per-value
    joint CDF of order totals (cents) for the URGENT vs LOW priority
    groups, built with the two-phase bucketed cumsum discipline
    (curation.py::_budget_prefix): per-value counts reduce to a value
    histogram, $10k-band bucket totals give broadcastable bases via a
    tiny window, and the per-value window is PARTITIONED BY BUCKET —
    its size is bounded by the band width (≤ 1e6 distinct cents
    values), never the corpus.  Returns one PERSISTED DataFrame
    (v, c0, c1, cum0, cum1) with inclusive cumulative counts."""
    f = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority").isin(_KS_G0, _KS_G1))
        .select(
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("v"),
            (F.col("o_orderpriority") == _KS_G1)
            .cast("long")
            .alias("g"),
        )
    )
    h = f.groupBy("v").agg(
        F.sum(1 - F.col("g")).cast("long").alias("c0"),
        F.sum("g").cast("long").alias("c1"),
    ).withColumn("bkt", F.expr(f"v div {_KS_BKT_C}"))
    btot = h.groupBy("bkt").agg(
        F.sum("c0").alias("b0"), F.sum("c1").alias("b1")
    )
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    bbase = btot.select(
        "bkt",
        F.coalesce(F.sum("b0").over(wb), F.lit(0)).alias("base0"),
        F.coalesce(F.sum("b1").over(wb), F.lit(0)).alias("base1"),
    )
    wv = (
        W.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        h.join(F.broadcast(bbase), "bkt")
        .select(
            "v",
            "c0",
            "c1",
            (F.col("base0") + F.sum("c0").over(wv)).alias("cum0"),
            (F.col("base1") + F.sum("c1").over(wv)).alias("cum1"),
        )
        .persist()  # value-histogram-sized; read by cdf and totals
    )


@query(
    "ks_two_sample_exact",
    oracle=f"""
    WITH f AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '{_KS_G1}' THEN 1 ELSE 0 END
               AS g
      FROM orders
      WHERE o_orderpriority IN ('{_KS_G0}', '{_KS_G1}')),
    h AS (
      SELECT v,
             CAST(sum(1 - g) AS BIGINT) AS c0,
             CAST(sum(g) AS BIGINT) AS c1
      FROM f GROUP BY 1),
    c AS (
      SELECT v,
             CAST(sum(c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0,
             CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1
      FROM h),
    tot AS (
      SELECT CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1
      FROM h),
    d AS (
      SELECT v, n0, n1, abs(cum0 * n1 - cum1 * n0) AS d_num
      FROM c CROSS JOIN tot)
    SELECT n0, n1, CAST(v AS BIGINT) AS at_cents,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(n0 * n1 AS BIGINT) AS d_den,
           round(CAST(d_num AS DOUBLE)
                 / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6)
             AS ks_d
    FROM d ORDER BY d_num DESC, v ASC LIMIT 1
    """,
)
def ks_two_sample_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    order-total distributions of the URGENT and LOW priority groups:
    D = sup_v |F0(v) − F1(v)|, evaluated at every distinct value with
    the CROSS-MULTIPLIED integer form |cum0·n1 − cum1·n0| so the sup
    itself is exact int64 arithmetic (no float CDFs).  The published
    ks_d is the single division d_num/(n0·n1) of two
    exactly-representable-in-double int64s (< 2^53 at the 100x
    replica), so it is correctly rounded and bit-identical across
    engines; argmax ties break to the smallest value.

    Scale: one orders scan to the value histogram; cumulatives use
    the two-phase bucketed cumsum (per-value window partitioned by
    $10k band — see _two_group_cdf); the sup is a TakeOrdered top-1.
    Int64: cum·n ≤ n0·n1 ≈ 9e12 at 100x (exact to ~3e9 rows per
    side; past that the cross-multiplied sup needs DECIMAL(38))."""
    cdf = _two_group_cdf(spark, sf)
    tot = cdf.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    d = cdf.crossJoin(F.broadcast(tot)).select(
        "v",
        "n0",
        "n1",
        F.abs(
            F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")
        ).alias("d_num"),
    )
    return (
        d.orderBy(F.desc("d_num"), F.asc("v"))
        .limit(1)
        .select(
            "n0",
            "n1",
            F.col("v").alias("at_cents"),
            F.col("d_num"),
            (F.col("n0") * F.col("n1")).alias("d_den"),
            F.round(
                F.col("d_num").cast("double")
                / (
                    F.col("n0").cast("double")
                    * F.col("n1").cast("double")
                ),
                6,
            ).alias("ks_d"),
        )
    )


@query(
    "mann_whitney_u_exact",
    oracle=f"""
    WITH f AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderpriority = '{_KS_G1}' THEN 1 ELSE 0 END
               AS g
      FROM orders
      WHERE o_orderpriority IN ('{_KS_G0}', '{_KS_G1}')),
    h AS (
      SELECT v,
             CAST(sum(1 - g) AS BIGINT) AS c0,
             CAST(sum(g) AS BIGINT) AS c1
      FROM f GROUP BY 1),
    c AS (
      SELECT v, c0, c1,
             CAST(sum(c0 + c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumt
      FROM h),
    r AS (
      SELECT CAST(sum(c1 * (2 * (cumt - c0 - c1) + c0 + c1 + 1))
                  AS BIGINT) AS r1_x2
      FROM c),
    tot AS (
      SELECT CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1
      FROM h)
    SELECT n0, n1, r1_x2,
           r1_x2 - n1 * (n1 + 1) AS u1_x2,
           2 * n0 * n1 - (r1_x2 - n1 * (n1 + 1)) AS u0_x2,
           round(CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
                 / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6)
             AS auc_g1
    FROM r CROSS JOIN tot
    """,
)
def mann_whitney_u_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Mann-Whitney U between the URGENT and LOW order-total
    samples, with textbook tie handling: tied values share the
    AVERAGE rank, kept integral by publishing ×2 ticks — a value
    block with combined count c starting after cumt−c observations
    has 2·avg-rank = 2·(cumt−c) + c + 1, so R1×2 and both U×2 are
    exact int64.  auc_g1 = U1/(n0·n1) is the common-language effect
    size (the probability a random LOW total exceeds a random URGENT
    one, ties half-weighted) — one correctly-rounded division of
    exact doubles, engine-identical.  Identity u0_x2 + u1_x2 =
    2·n0·n1 holds exactly.

    Scale: shares _two_group_cdf's one-scan two-phase machinery; the
    rank-sum is a map-side-combinable aggregate over the value
    histogram.  Int64: R1×2 ≤ n1·2N ≈ 9e13 at 100x."""
    cdf = _two_group_cdf(spark, sf)
    tot = cdf.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    r = cdf.agg(
        F.sum(
            F.col("c1")
            * (
                2 * (F.col("cum0") + F.col("cum1") - F.col("c0") - F.col("c1"))
                + F.col("c0")
                + F.col("c1")
                + 1
            )
        )
        .cast("long")
        .alias("r1_x2")
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return r.crossJoin(F.broadcast(tot)).select(
        "n0",
        "n1",
        "r1_x2",
        u1.alias("u1_x2"),
        (2 * F.col("n0") * F.col("n1") - u1).alias("u0_x2"),
        F.round(
            u1.cast("double")
            / (
                F.lit(2.0)
                * F.col("n0").cast("double")
                * F.col("n1").cast("double")
            ),
            6,
        ).alias("auc_g1"),
    )


@query(
    "user_burstiness_fano",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day
      FROM {EVENTS_US} events),
    ud AS (
      SELECT user_id, day, CAST(count(*) AS BIGINT) AS k
      FROM e GROUP BY 1, 2),
    span AS (
      SELECT CAST(max(day) - min(day) + 1 AS BIGINT) AS d FROM ud),
    u AS (
      SELECT user_id,
             CAST(sum(k) AS BIGINT) AS kk,
             CAST(sum(k * k) AS BIGINT) AS k2,
             CAST(count(*) AS BIGINT) AS active_days
      FROM ud GROUP BY 1)
    SELECT user_id, kk AS n_events, active_days,
           d AS span_days,
           (d * k2 - kk * kk) * 10000 // (d * kk) AS fano_e4
    FROM u CROSS JOIN span
    """,
)
def user_burstiness_fano(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user burstiness: the Fano factor (variance/mean) of the
    user's DAILY event counts over the global observation span, zero
    days included — the bot/burst-detection primitive for curation
    (Fano ≈ 1 is Poisson-like organic traffic; ≫1 is bursty;
    ≪1 is metronomic automation).  With D span days, K total
    events and Σk² over active days, F = var/mean =
    (D·Σk² − K²)/(D·K), published as exact 1e4 ticks — the
    numerator is ≥ 0 by Cauchy-Schwarz, so truncation has no sign
    hazard.

    Scale: one events scan → (user, day) aggregate → per-user
    sufficient statistics; the global span is a scalar off the same
    cached aggregate (no second FileScan) broadcast to every row.
    Int64: D·Σk² ≤ 365·K² ≈ 6e7 at 100x (6e15 even at 100 TB
    per-user K ~ 4e4); ×1e4 inside int64 throughout."""
    ud = (
        t(spark, sf, "events")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .persist()  # feeds both the span scalar and per-user stats
    )
    span = ud.agg(
        (F.max("day") - F.min("day") + 1).cast("long").alias("d")
    )
    u = ud.groupBy("user_id").agg(
        F.sum("k").cast("long").alias("kk"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("k2"),
        F.count(F.lit(1)).cast("long").alias("active_days"),
    )
    return u.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.col("kk").alias("n_events"),
        "active_days",
        F.col("d").alias("span_days"),
        F.expr(
            "(d * k2 - kk * kk) * 10000 div (d * kk)"
        ).alias("fano_e4"),
    )
