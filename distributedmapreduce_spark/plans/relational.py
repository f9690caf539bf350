"""Relational operator battery over the synthetic star schema
(SURVEY.md §7.5): scans/filters, the join family, aggregations,
grouping sets, windows, sorts/top-k, set ops, scalar functions,
pivot, range/as-of joins.

All absent from the reference (SURVEY.md §2.2) but part of the
declared engine surface.  Everything is built-in-function DataFrame
code — whole-stage codegen, pushdown-friendly; joins broadcast small
dimensions explicitly.

Determinism rules for the oracle hash-compare: every float aggregate
is rounded; every window/top-k ordering carries a unique tiebreak
column; timestamps in output are cast to DATE or string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .core import EVENTS_US, query, t

# --------------------------------------------------------------------------
# Scan / filter / projection (pushdown exercised: predicate + pruning)
# --------------------------------------------------------------------------


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
    """,
)
def scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .filter((F.col("l_shipdate") < "1996-01-01") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_linestatus,
             sum(CAST(round(l_quantity) AS BIGINT))                  AS sq,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT))       AS sbp_c,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4, 0)
                      AS BIGINT))                                    AS sdp_t,
             sum(CAST(round(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 1e6, 0) AS BIGINT))      AS sc_t,
             sum(CAST(round(l_discount * 100) AS BIGINT))            AS sd_c,
             count(*)                                                AS n
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag, l_linestatus,
           CAST(sq AS DOUBLE)                                AS sum_qty,
           sbp_c / 100.0                                     AS sum_base_price,
           sdp_t / 1e4                                       AS sum_disc_price,
           sc_t / 1e6                                        AS sum_charge,
           floor(CAST(sq AS DOUBLE) / n * 1e4 + 0.5) / 1e4   AS avg_qty,
           floor(sbp_c / 100.0 / n * 1e4 + 0.5) / 1e4        AS avg_price,
           floor(sd_c / 100.0 / n * 1e4 + 0.5) / 1e4         AS avg_disc,
           n                                                 AS count_order
    FROM g
    """,
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape — the canonical wide-agg scan."""
    li = t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # EVERY sum runs as an exact scaled-long aggregate (values are
    # 0/2dp-exact): a plain double sum accumulates ~n·ulp(total) error
    # — ~1.5e2 absolute at the 100x replica's 2.8e11 totals — so its
    # 2dp round flips between engines whenever a group total lands on
    # a boundary (caught by the round-4 100x spot-check).  The avgs
    # are rebuilt from the exact sums with the floor(x*1e4+0.5) tick
    # rule (same for positives as round-half-up, and immune to
    # Spark's decimal-string rounding path).  Long overflow only past
    # ~9e12 in the charge column — repartition the group or widen the
    # scale there.
    g = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sq"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("sbp_c"),
            F.sum(F.round(disc * 1e4, 0).cast("long")).alias("sdp_t"),
            F.sum(
                F.round(disc * (1 + F.col("l_tax")) * 1e6, 0).cast("long")
            ).alias("sc_t"),
            F.sum(
                F.round(F.col("l_discount") * 100).cast("long")
            ).alias("sd_c"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    def _tick4(x):
        return F.floor(x * 1e4 + 0.5) / 1e4

    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        (F.col("sbp_c") / 100.0).alias("sum_base_price"),
        (F.col("sdp_t") / 1e4).alias("sum_disc_price"),
        (F.col("sc_t") / 1e6).alias("sum_charge"),
        _tick4(F.col("sq").cast("double") / F.col("n")).alias("avg_qty"),
        _tick4(F.col("sbp_c") / 100.0 / F.col("n")).alias("avg_price"),
        _tick4(F.col("sd_c") / 100.0 / F.col("n")).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


@query(
    "agg_battery",
    oracle="""
    SELECT count(*)                              AS n_rows,
           count(DISTINCT l_partkey)             AS n_parts,
           round(sum(l_quantity), 2)             AS total_qty,
           round(avg(l_extendedprice), 4)        AS avg_price,
           round(min(l_extendedprice), 2)        AS min_price,
           round(max(l_extendedprice), 2)        AS max_price,
           round(stddev_samp(l_discount), 6)     AS sd_disc
    FROM lineitem
    """,
)
def agg_battery(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
    )


@query("approx_count_distinct", oracle=None)  # HLL sketches differ per engine
def approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL-sketch distinct estimates (the 100 TB substitute for exact
    countDistinct); sketches differ per engine -> rows-only check."""
    return t(spark, sf, "lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact cents: the grand-total double sum drifts past the
            # 2dp round at ~1e12 magnitudes (100x replica find)
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0
            ).alias("total"),
        )
    )


@query(
    "cube_events",
    oracle=f"""
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM {EVENTS_US} events
    GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
)
def cube_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    return ev.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    out = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------


@query(
    "join_inner_cust_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
             AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_cust_orders(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents (100x replica find: ~7e11 double sums drift
            # past the 2dp round boundary)
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0
            ).alias("revenue"),
        )
    )


@query(
    "join_left_order_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_order_counts(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    f_orders = o.filter(F.col("o_orderstatus") == "F")
    return c.join(
        f_orders, c.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti join: customers with no RECENT orders (the unfiltered
    variant is vacuously empty on this data — every customer has some
    order; the date predicate makes the anti semantics observable)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast_nation_revenue",
    oracle="""
    SELECT n_name, r_name,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4, 0)
                    AS BIGINT)) / 1e4 AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def join_broadcast_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Star join: fact scan + three explicitly-broadcast dimensions —
    the no-shuffle-on-the-fact-side plan that survives 100 TB."""
    li = t(spark, sf, "lineitem")
    s = F.broadcast(t(spark, sf, "supplier"))
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            # nation-level revenue reaches ~1e10 at 10x sf0.1, where a
            # 4dp round sits below double ulp — sum the 4dp-exact
            # products as scaled longs (see q1_pricing_summary)
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 1e4,
                        0,
                    ).cast("long")
                )
                / 1e4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + top-k."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey,
           rank()       OVER (ORDER BY round(s_acctbal, 2) DESC, s_suppkey) AS rnk,
           dense_rank() OVER (ORDER BY round(s_acctbal, 2) DESC, s_suppkey) AS drnk,
           ntile(4)     OVER (ORDER BY round(s_acctbal, 2) DESC, s_suppkey) AS quartile
    FROM supplier
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf: str) -> DataFrame:
    w = W.orderBy(F.desc(F.round("s_acctbal", 2)), "s_suppkey")
    return t(spark, sf, "supplier").select(
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_event_gaps",
    oracle=f"""
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS gap_us
    FROM {EVENTS_US} events
    """,
)
def window_lag_event_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Gap in exact integer microseconds — float seconds round-trip
    differently across engines at half-way boundaries."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf, "events")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return ev.select("user_id", "event_id", gap.alias("gap_us"))


@query(
    "window_running_sum_per_user",
    oracle=f"""
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_value
    FROM {EVENTS_US} events
    """,
)
def window_running_sum_per_user(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k, set operations
# --------------------------------------------------------------------------


@query(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders_global(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract = SQL EXCEPT (set semantics: drop every key present in b)
    return a.subtract(b)


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS upper_name,
           length(p_name)                      AS name_len,
           substr(p_brand, 1, 5)               AS brand5,
           concat(p_brand, ':', p_type)        AS brand_type,
           regexp_extract(p_name, '([a-z]+)')  AS first_word,
           replace(p_type, ' ', '_')           AS type_snake
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand5"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                 AS yr,
           CAST(month(o_orderdate) AS INT)                AS mo,
           CAST(quarter(o_orderdate) AS INT)              AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)    AS plus30,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
    FROM orders
    """,
)
def date_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
           round(sqrt(l_quantity), 4)    AS sqrt_qty,
           round(abs(l_discount - 0.05), 4) AS abs_disc,
           round(pow(l_quantity, 2), 2)  AS qty_sq,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           round(ln(l_extendedprice + 1), 6) AS log_price
    FROM lineitem
    """,
)
def math_functions(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            # 6 = the product's exact decimal precision (2dp x 2dp x
            # 2dp); rounding below it hits half-way boundaries where
            # Spark and DuckDB round the same double differently
            6,
        ).alias("charge"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Range join + as-of join (Spark lacks natives — composed from built-ins)
# --------------------------------------------------------------------------


@query(
    "range_join_event_pairs",
    oracle=f"""
    SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs
    FROM {EVENTS_US} a JOIN {EVENTS_US} b
      ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 SECOND
    GROUP BY a.event_type, b.event_type
    """,
)
def range_join_event_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Interval self-join via bucketed equi-join: floor each ts to the
    10s bucket, join (bucket, bucket+1) candidates, then filter the
    exact range predicate.  Turns an O(n^2) theta join into a shuffle
    hash join on bucket id — the formulation that survives 100 TB
    (DuckDB oracle uses its native IEJoin on the plain theta join)."""
    # exact integer microseconds — float seconds would disagree with
    # the oracle's timestamp arithmetic at exact-boundary pairs
    ev = t(spark, sf, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    win = 10_000_000  # 10s in us
    a = ev.select(
        F.col("event_type").alias("type_a"),
        F.col("us").alias("us_a"),
        F.floor(F.col("us") / win).alias("bucket"),
    )
    b = ev.select(
        F.col("event_type").alias("type_b"),
        F.col("us").alias("us_b"),
        F.explode(
            F.array(F.floor(F.col("us") / win) - 1, F.floor(F.col("us") / win))
        ).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") <= F.col("us_a") + win)
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "asof_join_purchase_click",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           max(c.event_id) AS last_click_id
    FROM {EVENTS_US} p JOIN {EVENTS_US} c
      ON p.user_id = c.user_id AND c.event_type = 'click' AND c.ts <= p.ts
         AND c.event_id <> p.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    HAVING max(c.ts) IS NOT NULL
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click by the same
    user at or before it.  Composed as union + last_value window — one
    shuffle on user_id, no theta join (SNIPPETS/OLAP 'union trick').

    NOTE the deterministic tiebreak: among clicks sharing the max ts we
    take max event_id (oracle's max(c.event_id) over ties is the same
    because event ids increase with ts)."""
    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases)
    # clicks sort before purchases at identical ts via kind flag so a
    # simultaneous click is visible to the purchase (ts <= p.ts).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("click_id").isNull().cast("int"), "click_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    annotated = merged.withColumn("last_click_id", F.max("click_id").over(w))
    return (
        annotated.filter(
            F.col("purchase_id").isNotNull() & F.col("last_click_id").isNotNull()
        )
        .select("purchase_id", "last_click_id")
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset intersect — duplicates survive up to the min
    multiplicity per side (the bag semantics SQL engines implement
    with a counted anti/semi aggregate underneath)."""
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except_all(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "unpivot_part_attrs",
    oracle="""
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             round(p_retailprice, 2) AS retailprice
      FROM part)
    UNPIVOT (val FOR attr IN (size, retailprice))
    """,
)
def unpivot_part_attrs(spark: SparkSession, sf: str) -> DataFrame:
    """unpivot/melt — wide-to-long reshape, the inverse of
    pivot_status_priority."""
    p = t(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.round("p_retailprice", 2).alias("retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


@query(
    "time_rollup_multires",
    oracle=f"""
    SELECT resolution, bucket, event_type, n, total_value FROM (
      SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket,
             event_type, count(*) AS n, round(sum(value), 4) AS total_value
      FROM {EVENTS_US} events GROUP BY 2, 3
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type,
             count(*), round(sum(value), 4)
      FROM {EVENTS_US} events GROUP BY 2, 3
      UNION ALL
      SELECT 'week', date_trunc('week', ts), event_type,
             count(*), round(sum(value), 4)
      FROM {EVENTS_US} events GROUP BY 2, 3)
    """,
)
def time_rollup_multires(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hour/day/week
    resolutions in ONE scan via GROUPING SETS over the three
    date_trunc buckets (the UNION ALL oracle formulation scans per
    resolution).  At scale this materializes incrementally per
    ingest window; the grouping-sets shape is the batch backfill."""
    ev = t(spark, sf, "events")
    ev.createOrReplaceTempView("__rollup_events")
    return spark.sql(
        """
        SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                    WHEN d IS NOT NULL THEN 'day'
                    ELSE 'week' END AS resolution,
               coalesce(h, d, w) AS bucket,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
                     date_trunc('week', ts) AS w, event_type, value
              FROM __rollup_events)
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type),
                                (w, event_type))
        """
    )


_ASOF_FWD_TOL_US = 7 * 86_400 * 1_000_000  # 7-day forward tolerance


@query(
    "asof_join_forward_tolerance",
    oracle=f"""
    SELECT click_id, purchase_id, gap_us FROM (
      SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY p.ts, p.event_id) AS rn
      FROM {EVENTS_US} c JOIN {EVENTS_US} p
        ON p.user_id = c.user_id
       AND p.event_type = 'purchase'
       AND epoch_us(p.ts) > epoch_us(c.ts)
       AND epoch_us(p.ts) <= epoch_us(c.ts) + {_ASOF_FWD_TOL_US}
      WHERE c.event_type = 'click')
    WHERE rn = 1
    """,
)
def asof_join_forward_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each click, the first
    purchase by the same user strictly after it and within 7 days —
    the attribution-window join (backward twin:
    asof_join_purchase_click).  Same union-trick plan, mirrored: one
    (user_id) shuffle, a forward-looking window taking the min
    (ts, purchase_id) struct, and the tolerance applied as exact
    integer-µs arithmetic afterwards — no theta join at any scale.
    At equal timestamps purchases sort BEFORE clicks, so the
    forward-inclusive frame naturally excludes simultaneous purchases
    (strictly-after semantics) without a second pass."""
    ev = t(spark, sf, "events")
    us = F.unix_micros("ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        us.alias("us"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("us"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases)
    # purchases first at identical us (kind flag 0 < 1): the click's
    # forward frame then starts past them -> strict "after"
    w = (
        W.partitionBy("user_id")
        .orderBy("us", F.col("purchase_id").isNull().cast("int"), "purchase_id")
        .rowsBetween(0, W.unboundedFollowing)
    )
    nxt = F.min(
        F.when(
            F.col("purchase_id").isNotNull(),
            F.struct(F.col("us").alias("us_p"), "purchase_id"),
        )
    ).over(w)
    annotated = merged.select(
        "click_id", "us", nxt.alias("nxt")
    ).filter(F.col("click_id").isNotNull() & F.col("nxt").isNotNull())
    return (
        annotated.select(
            "click_id",
            F.col("nxt.purchase_id").alias("purchase_id"),
            (F.col("nxt.us_p") - F.col("us")).alias("gap_us"),
        )
        .filter(
            (F.col("gap_us") > 0) & (F.col("gap_us") <= _ASOF_FWD_TOL_US)
        )
    )
