"""Product/ops analytics and view-maintenance operators, round 3:
time-bucket gap filling, incremental materialized-view refresh,
event-transition (Markov) counts, and retention cohorts.

Like plans/curation.py these extend the reference's single-job surface
(/root/reference/master.py:99-167) with the operational queries a lake
engine is actually kept around for.  All oracles follow
ORACLE_PORTABILITY.md: µs-pinned event timestamps (EVENTS_US),
BIGINT-pinned counts, exact cents arithmetic instead of double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .core import EVENTS_US, query, t


@query(
    "time_bucket_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM {EVENTS_US} events),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS wstart
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT date_trunc('hour', ts) AS wstart, event_type,
             count(*) AS n
      FROM {EVENTS_US} events GROUP BY 1, 2)
    SELECT g.wstart, ty.event_type, coalesce(c.n, 0) AS n
    FROM grid g
    CROSS JOIN types ty
    LEFT JOIN counts c
      ON c.wstart = g.wstart AND c.event_type = ty.event_type
    """,
)
def time_bucket_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly counts per event type with EMPTY BUCKETS FILLED — the
    hypertable/timeseries gap-fill every dashboard and forecasting
    featurizer needs (a missing bucket means zero, not "no row").
    Scale: the aggregate is the only corpus-sized shuffle; both join
    sides are grid-sized afterwards ((time-range / 1h) x n_types
    rows), and the aggregated counts — the only side a LEFT join may
    broadcast — get the broadcast hint.  At 100 TB a year of hourly
    buckets x 1000 types is still <9M rows — trivially broadcastable."""
    ev = t(spark, sf, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("wstart"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("wstart")
    )
    types = ev.select("event_type").distinct()
    dim = grid.crossJoin(types)
    return dim.join(
        F.broadcast(counts), ["wstart", "event_type"], "left"
    ).select("wstart", "event_type", F.coalesce("n", F.lit(0)).alias("n"))


@query(
    "mv_incremental_refresh",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events GROUP BY event_type
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view maintenance: a pre-aggregated
    per-type view (built from the 90% "already ingested" slice) is
    refreshed by MERGING the delta batch's partial aggregate — never
    re-scanning the base data.  The oracle is the full recompute; the
    refresh path must equal it exactly, which is the correctness
    contract of every incremental-view engine.  Sums run in exact
    cents (value is 2dp, so round(value*100) is an integer and
    addition is associative) — a double sum would make merge order
    observable.  Scale: the base aggregate is metadata-sized (one row
    per type); refresh cost is O(delta), the whole point at 100 TB."""
    ev = t(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("total_cents"),
        )

    base = agg(ev.filter(F.col("event_id") % 10 != 0))
    delta = agg(ev.filter(F.col("event_id") % 10 == 0))
    merged = base.alias("b").join(
        delta.alias("d"), "event_type", "full_outer"
    )
    z = F.lit(0).cast("long")
    return merged.select(
        "event_type",
        (F.coalesce("b.n", z) + F.coalesce("d.n", z)).alias("n"),
        (
            F.coalesce("b.total_cents", z) + F.coalesce("d.total_cents", z)
        ).alias("total_cents"),
    )


@query(
    "event_transition_counts",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM {EVENTS_US} events)
    SELECT prev_type, event_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_counts(spark: SparkSession, sf: str) -> DataFrame:
    """First-order transition (Markov) matrix over each user's event
    sequence: counts of consecutive (prev -> next) event-type pairs —
    the input to funnel diagnostics and next-action models.  Ties on
    ts break by event_id so the sequence is deterministic.  Scale: one
    (user_id) window shuffle, then a k^2-cardinality aggregate (k =
    event types) that reduces map-side to almost nothing."""
    ev = t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_Z_BITS = 16  # bits per dimension in the Morton interleave


def _zorder_oracle() -> str:
    x = f"(o_custkey % {1 << _Z_BITS})"
    y = (
        f"(date_diff('day', DATE '1970-01-01', o_orderdate)"
        f" % {1 << _Z_BITS})"
    )
    terms = " + ".join(
        f"(({x} // {1 << k}) % 2) * {1 << (2 * k)}"
        f" + (({y} // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(_Z_BITS)
    )
    return f"""
    SELECT o_orderkey, CAST({terms} AS BIGINT) AS zorder
    FROM orders
    """


@query("zorder_cluster_orders", oracle=_zorder_oracle())
def zorder_cluster_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order date) —
    the space-filling-curve layout op behind multi-column data
    skipping: sorting/range-partitioning files by this key keeps BOTH
    a customer predicate AND a date predicate effective against
    min/max file statistics, where a lexicographic sort serves only
    its leading column.  16 bits per dimension interleaved with pure
    integer shifts — bit-identical on both engines.  At 100 TB this
    key feeds write-time `repartitionByRange(zorder)` + sortWithin-
    Partitions; the query emits the key itself so the layout decision
    is oracle-checkable."""
    orders = t(spark, sf, "orders")
    x = (F.col("o_custkey") % (1 << _Z_BITS)).cast("long")
    y = (
        F.datediff("o_orderdate", F.lit("1970-01-01")) % (1 << _Z_BITS)
    ).cast("long")
    z = None
    for k in range(_Z_BITS):
        xb = F.shiftright(x, k).bitwiseAND(F.lit(1)) * (1 << (2 * k))
        yb = F.shiftright(y, k).bitwiseAND(F.lit(1)) * (1 << (2 * k + 1))
        z = xb + yb if z is None else z + xb + yb
    return orders.select("o_orderkey", z.cast("long").alias("zorder"))


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    parse_json once into a variant column, then typed variant_get
    extraction — the open-schema ingestion path that replaces
    per-field get_json_object re-parsing (json_extract_props in
    plans/relational.py is the string-path twin; this one parses each
    props value exactly once and serves any number of field reads
    from the binary variant encoding, which is the cost model that
    matters when props is a 2 KB blob with 40 fields, not '{"k": n}').
    Sums are BIGINT-pinned per ORACLE_PORTABILITY.md."""
    ev = t(spark, sf, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey)
    SELECT f.cohort_month,
           date_trunc('month', o.o_orderdate) AS order_month,
           count(*) AS n_orders
    FROM orders o JOIN firsts f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Retention cohort table: customers grouped by their first-order
    month, orders counted by (cohort month, order month) — the
    classic retention triangle.  Implemented with a per-customer
    window min instead of an aggregate+self-join, so the orders table
    is scanned and shuffled ONCE (on o_custkey) and the cohort label
    rides along to the final small aggregate."""
    orders = t(spark, sf, "orders")
    month = F.trunc("o_orderdate", "month")
    w = W.partitionBy("o_custkey")
    with_cohort = orders.select(
        month.alias("order_month"),
        F.min(month).over(w).alias("cohort_month"),
    )
    return with_cohort.groupBy("cohort_month", "order_month").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
