"""TPC-H-shaped multi-join analytics over the synthetic star schema.

The reference has no joins at all (SURVEY.md §2.2), but an engine that
replaces it must run the canonical warehouse query shapes.  These are
the classic TPC-H forms adapted to the trimmed testdata schema (no
partsupp, no l_commitdate/l_receiptdate/l_shipmode; p_type is a single
word; nations are NATION_0..24):

All 22 canonical query shapes are covered (q1/q3 live in
plans/relational.py as the pricing-summary and shipping-priority
flagships):

  q2  — min-cost supplier per part (correlated min -> partition window)
  q4  — semi-join EXISTS with a correlated non-equi predicate
  q5  — 6-table snowflake join, two broadcast dims
  q6  — single-scan predicate aggregate (pushdown showcase)
  q7  — self-aliased dimension (nation x2) + year rollup
  q9  — product-line profit by nation x year (5-way join)
  q10 — fact-fact join + top-k by aggregate
  q11 — HAVING vs a global scalar aggregate (broadcast 1-row total)
  q12 — CASE-sum priority mix by ship-latency bucket
  q14 — conditional aggregate over a broadcast part join
  q16 — distinct supplier counts + NOT-IN exclusion (anti join)
  q17 — per-key scalar aggregate joined back (avg-quantity limit)
  q18 — HAVING-filtered semi join on an aggregate key set
  q19 — disjunctive AND-group predicate, one equi-join (no union)
  q20 — nested-IN chain (part filter -> grouped HAVING -> semi join)
  q22 — scalar-subquery threshold + date-bounded anti join

Scale notes (100 TB): nation/region/part/supplier are broadcast —
never shuffled; every fact-fact join keys on orderkey/custkey which
AQE can skew-split; q17's per-part limit is a partial-agg shuffle of
(partkey, sum, count), not a window over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .core import query, t

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 shape; the reference schema lacks commit/receipt dates, so
    "late" is l_shipdate more than 90 days after the order date —
    still a correlated-EXISTS semi join with a non-equi conjunct."""
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add("o_orderdate", 90)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    nation_region = broadcast(
        t(spark, sf, "nation").join(
            broadcast(t(spark, sf, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    supplier = broadcast(
        t(spark, sf, "supplier").join(
            nation_region, F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    return (
        t(spark, sf, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t(spark, sf, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q6: the pure pushdown showcase — every predicate reaches the
    parquet scan; no shuffle at all (single global agg)."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    nation = t(spark, sf, "nation")
    n1 = broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    joined = (
        broadcast(t(spark, sf, "supplier"))
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t(spark, sf, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Q10: top 20 customers by lost (returned) revenue.  c_custkey
    tiebreak makes the LIMIT deterministic for the oracle hash."""
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        t(spark, sf, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast(t(spark, sf, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(
            broadcast(t(spark, sf, "part").select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_rev()), 6).alias(
                "promo_revenue"
            )
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pa_partkey, 0.2 * avg(l_quantity) AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pa_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < qty_limit
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q17: per-part average-quantity limit joined back to the fact.
    The limit table is partkey-grouped (partial agg before shuffle);
    at scale it is orders-of-magnitude smaller than the fact, so the
    join-back broadcasts."""
    li = t(spark, sf, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    brand = broadcast(
        t(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    return (
        li.join(brand, F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(part_avg), F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    big = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sum_qty")
    ).filter(F.col("sum_qty") > 300).select(
        F.col("l_orderkey").alias("big_orderkey")
    )
    return (
        t(spark, sf, "customer")
        .join(t(spark, sf, "orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH threshold AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey < 10
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, threshold
    WHERE c_nationkey < 10
      AND c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """Q22: rich customers (above-average balance) with no recent
    orders — scalar-subquery threshold broadcast as a 1-row cross
    join, then an anti join against the date-filtered orders."""
    cust = t(spark, sf, "customer").filter(F.col("c_nationkey") < 10)
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    return (
        cust.join(broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_5'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                          AND TIMESTAMP '1997-12-31'
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """Q8: one nation's share of a region's PROMO-part revenue by
    year — 8-way snowflake, every dimension broadcast, the two
    nation roles as independent broadcast aliases."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    part = broadcast(
        t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    nation = t(spark, sf, "nation")
    region = broadcast(t(spark, sf, "region").filter(F.col("r_name") == "AMERICA"))
    cust_nation = broadcast(
        t(spark, sf, "customer")
        .join(
            nation.join(
                region, F.col("n_regionkey") == F.col("r_regionkey")
            ).select(F.col("n_nationkey").alias("cn_key")),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey")
    )
    supp_nation = broadcast(
        t(spark, sf, "supplier")
        .join(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = _rev()
    nation5 = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(nation5) / F.sum(vol), 6).alias("mkt_share"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Q13: distribution of per-customer order counts — left join with
    an ON-clause filter (customers with zero matching orders must
    survive with count 0), then an aggregate of an aggregate."""
    cust = t(spark, sf, "customer").select("c_custkey")
    orders = t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q15: supplier(s) with the quarter's max revenue — the revenue
    "view" built once, its max joined back as a broadcast scalar."""
    rev = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        broadcast(t(spark, sf, "supplier"))
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21_suppliers_who_kept_waiting(spark: SparkSession, sf: str) -> DataFrame:
    """Q21: the sole-blame query — suppliers whose line was the ONLY
    late one on a multi-supplier finished order ("late" adapted to
    shipdate > orderdate + 60d; the trimmed schema has no receipt/
    commit dates).  The EXISTS becomes a semi join against other-
    supplier lines, the NOT EXISTS an anti join against other-supplier
    LATE lines — both keyed on orderkey, correlated predicates carried
    as non-equi join conditions."""
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add("o_orderdate", 60))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    sole_blame = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey"))
            & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.date_add("o_orderdate", 60)),
            "left_anti",
        )
    )
    return (
        sole_blame.join(
            broadcast(t(spark, sf, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(round(l_extendedprice / l_quantity, 6)) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), candidates AS (
      SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS best_cost
      FROM part
      JOIN cost ON p_partkey = l_partkey
      JOIN eu   ON l_suppkey = s_suppkey
      WHERE p_type = 'LARGE' AND p_size <= 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM candidates WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 shape (no partsupp in this schema): the supplier offering
    the minimum unit cost per part within one region, unit cost
    derived from observed lineitem prices.  The canonical correlated
    scalar subquery (min cost per part, region-scoped) becomes a
    min-window over the part key — partition-parallel, no re-scan of
    the fact; region dims broadcast.  Cost is rounded to 6dp BEFORE
    the min on both engines so the equality join on the minimum is
    bit-identical."""
    cost = (
        t(spark, sf, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
            ).alias("unit_cost")
        )
    )
    eu = (
        t(spark, sf, "supplier")
        .join(
            broadcast(t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            broadcast(t(spark, sf, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t(spark, sf, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    from pyspark.sql import Window as W

    cands = (
        broadcast(parts)
        .join(cost, F.col("p_partkey") == F.col("l_partkey"))
        .join(broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "best_cost",
            F.min("unit_cost").over(W.partitionBy("p_partkey")),
        )
    )
    return (
        cands.filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           sum(CAST(round((l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity) * 1e4, 0)
               AS BIGINT)) / 1e4 AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    """Q9 shape: per-nation per-year profit on one product line.  No
    partsupp means no ps_supplycost; cost is modeled as half the
    part's retail price per unit, keeping the canonical
    revenue-minus-cost aggregate over a 5-way join with broadcast
    part/supplier/nation dims.  Each profit term is 4dp-exact
    (2dp x 2dp revenue; 3dp cost), so the group sum runs as scaled
    longs — exact, engine-identical, and inside vectorized long-sum
    codegen — instead of round(sum(double), 4), whose last digit can
    flip across engines once the sum nears a 0.00005 boundary (the
    q1_pricing_summary pattern)."""
    li = t(spark, sf, "lineitem")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            broadcast(
                t(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            broadcast(t(spark, sf, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            broadcast(t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t(spark, sf, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (F.sum(F.round(profit * 1e4, 0).cast("long")) / 1e4).alias(
                "sum_profit"
            )
        )
    )


@query(
    "tpch_q11_important_part_value",
    oracle="""
    WITH scoped AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
    ), total AS (SELECT sum(v) AS tot FROM scoped)
    SELECT l_partkey AS p_key, round(sum(v), 4) AS part_value
    FROM scoped, total
    GROUP BY l_partkey, tot
    HAVING sum(v) > 0.001 * tot
    """,
)
def tpch_q11_important_part_value(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 shape: parts representing a significant fraction of one
    region's traded value — a HAVING threshold against a global
    scalar aggregate.  The scalar total broadcasts as a 1-row cross
    join (never a second scan pass per group); the scoped revenue CTE
    shuffles once on partkey."""
    nations = (
        t(spark, sf, "nation")
        .filter(F.col("n_regionkey") == 2)
        .select("n_nationkey")
    )
    scoped = (
        t(spark, sf, "lineitem")
        .join(
            broadcast(t(spark, sf, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("l_partkey", _rev().alias("v"))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("v").alias("pv"))
    total = scoped.agg(F.sum("v").alias("tot"))
    return (
        per_part.join(broadcast(total))
        .filter(F.col("pv") > 0.001 * F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_key"),
            F.round("pv", 4).alias("part_value"),
        )
    )


@query(
    "tpch_q12_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                THEN 'SLOW' ELSE 'FAST' END AS ship_latency,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q12_ship_latency_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shape (no l_shipmode column): order-priority mix by ship
    latency bucket — the canonical conditional-count (CASE-sum)
    aggregate over the orders x lineitem join with the date filter
    pushed to the lineitem scan."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t(spark, sf, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.when(
                F.datediff("l_shipdate", "o_orderdate") > 60, "SLOW"
            )
            .otherwise("FAST")
            .alias("ship_latency")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per part attribute with a
    NOT-IN supplier exclusion (negative account balance stands in for
    the comment-based complaints filter; supplier-part pairs come from
    lineitem since there is no partsupp).  The exclusion is a
    broadcast anti join; the distinct count shuffles once on the
    grouped attributes."""
    excluded = (
        t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    return (
        t(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4, 0)
               AS BIGINT)) / 1e4 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 shape: revenue under an OR of AND-groups mixing part
    attributes and lineitem quantities — the classic disjunctive
    predicate that must still execute as ONE broadcast equi-join on
    partkey with the disjunction as a post-join filter (not a union
    of three scans, and never a cartesian)."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        # scaled-long sum: 4dp-exact revenue terms, see q9 / q1 notes
        .agg(
            (F.sum(F.round(_rev() * 1e4, 0).cast("long")) / 1e4).alias(
                "revenue"
            )
        )
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 1
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 45
      )
    ORDER BY s_name
    """,
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 shape: suppliers in one region who moved more than a
    threshold quantity of any 'small*' part in 1996 — the canonical
    nested-IN chain (part filter -> grouped lineitem HAVING ->
    supplier semi join), each level a broadcast or semi join, no
    correlated re-execution."""
    small_parts = (
        t(spark, sf, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    movers = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(
            broadcast(small_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 45)
        .select("l_suppkey")
        .distinct()
    )
    region_nations = (
        t(spark, sf, "nation")
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey")
    )
    return (
        t(spark, sf, "supplier")
        .join(
            broadcast(region_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(
            movers,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
