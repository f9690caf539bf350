"""Second relational battery: analytic window functions, grouping
sets, exact percentiles, correlation, null-handling scalars, HAVING,
CASE bucketing, and the vectorized Pandas-UDF path (the engine's
sanctioned escape hatch when built-ins can't express a computation —
Arrow-batched, not row-at-a-time)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import EVENTS_US, query, t


@query(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_order,
           lead(o_orderkey) OVER w AS next_order,
           round(percent_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.round(F.percent_rank().over(w_price), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("cdist"),
    )


@query(
    "grouping_sets_events",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), (event_type, user_id % 10))
    """,
)
def grouping_sets_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    ev.createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n
        FROM __gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10),
                                (event_type, user_id % 10))
        """
    )


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4)      AS q1_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``); the approx variant is approx_quantiles below."""
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
            "median_price"
        ),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias(
            "p90_price"
        ),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
    )


@query(
    "approx_quantiles",
    oracle="""
    SELECT quantile_disc(l_extendedprice, 0.5)  AS approx_median,
           quantile_disc(l_extendedprice, 0.99) AS approx_p99
    FROM lineitem
    """,
)
def approx_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles (the scale path next
    to percentiles_exact).  The sketch stays bounded-memory and
    mergeable at any corpus size; accuracy=1e6 makes eps*n < 1 at the
    test SFs, so the sketch answer IS the exact discrete order
    statistic and DuckDB's quantile_disc is a bit-identical oracle
    (verified equal to quantile_disc at sf0.001/0.01/0.1; the default
    acc 1e4 differs by ~eps*n ranks as theory predicts, and acc 1e6
    already drifts at n=600k because the sketch compresses on buffer
    bounds before the eps*n<1 guarantee applies — hence 1e7).  At
    100 TB you dial accuracy to the memory/error trade-off you want —
    the plan is unchanged."""
    li = t(spark, sf, "lineitem")
    return li.agg(
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10_000_000)
        ).alias("approx_median"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.99), F.lit(10_000_000)
        ).alias("approx_p99"),
    )


@query(
    "corr_covar",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(var_samp(l_discount), 8)                    AS disc_var
    FROM lineitem
    """,
)
def corr_covar(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.var_samp("l_discount"), 8).alias("disc_var"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_or_open,
           CAST(o_orderstatus IS NULL AS BOOLEAN)         AS status_is_null,
           ifnull(nullif(o_orderpriority, o_orderpriority), 'ALL-NULL') AS forced,
           least(o_orderkey, o_custkey)                   AS least_key,
           greatest(o_orderkey, o_custkey)                AS greatest_key
    FROM orders
    """,
)
def null_handling(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.col("o_orderstatus").isNull().alias("status_is_null"),
        F.ifnull(
            F.nullif("o_orderpriority", F.col("o_orderpriority")),
            F.lit("ALL-NULL"),
        ).alias("forced"),
        F.least("o_orderkey", "o_custkey").alias("least_key"),
        F.greatest("o_orderkey", "o_custkey").alias("greatest_key"),
    )


@query(
    "having_big_customers",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 5 AND sum(o_totalprice) > 100000
    """,
)
def having_big_customers(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("__spend"),
        )
        .filter((F.col("n_orders") >= 5) & (F.col("__spend") > 100000))
        .select("o_custkey", "n_orders", F.round("__spend", 2).alias("spend"))
    )


@query(
    "case_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def case_price_buckets(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "pandas_udf_zscore",
    oracle="""
    WITH stats AS (
      SELECT avg(value) AS mu, stddev_samp(value) AS sigma FROM events)
    SELECT event_id, round((value - mu) / sigma, 6) AS zscore
    FROM events, stats
    """,
)
def pandas_udf_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """The sanctioned Python escape hatch: an Arrow-batched Pandas UDF
    (vectorized, ~10-100x over row-at-a-time) computing a z-score
    against broadcast global stats.  Deterministic arithmetic, so it
    still gets a SQL oracle."""
    ev = t(spark, sf, "events")
    mu, sigma = ev.agg(
        F.avg("value"), F.stddev_samp("value")
    ).first()

    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        return (v - mu) / sigma

    return ev.select("event_id", F.round(zscore("value"), 6).alias("zscore"))


@query(
    "skew_salted_join_counts",
    oracle="""
    SELECT e.event_type, d.type_rank,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e
    JOIN (SELECT event_type, row_number() OVER (ORDER BY event_type)
                 AS type_rank
          FROM (SELECT DISTINCT event_type FROM events)) d
      ON e.event_type = d.event_type
    GROUP BY e.event_type, d.type_rank
    """,
)
def skew_salted_join_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Hot-key join through explicit salting: events.event_type has a
    handful of distinct values (every key is hot), the dimension is
    replicated n_salts times and the fact side salted, so each key's
    rows spread over n_salts tasks instead of one.  Output is
    oracle-identical to the plain join."""
    from ..operators.skew import salted_join

    events = t(spark, sf, "events")
    w = W.orderBy("event_type")
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_rank", F.row_number().over(w))
    )
    return (
        salted_join(events, dim, on="event_type", n_salts=8)
        .groupBy("event_type", "type_rank")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "pandas_udaf_geomean",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 4) AS geomean_price,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pandas_udaf_geomean(spark: SparkSession, sf: str) -> DataFrame:
    """User-defined AGGREGATE surface: a grouped-agg Pandas UDF
    (Arrow-batched, one Python call per group) computing the geometric
    mean — a holistic-looking agg that still has an exact SQL twin
    (exp of avg-log), so the UDAF path itself is hash-checked."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with JVM aggregates in one
        # agg() — the count rides the same Arrow batch instead
        return len(v)

    return (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(geomean("o_totalprice"), 4).alias("geomean_price"),
            n_rows("o_totalprice").alias("n"),
        )
    )


@query(
    "udtf_token_positions",
    oracle="""
    SELECT doc_id, pos, token,
           CAST(strlen(token) AS INTEGER) AS token_len
    FROM (
      WITH toks AS (
        SELECT doc_id,
               list_filter(str_split(text, ' '), x -> x <> '') AS ws
        FROM documents)
      SELECT doc_id,
             CAST(generate_subscripts(ws, 1) - 1 AS INTEGER) AS pos,
             unnest(ws) AS token
      FROM toks WHERE len(ws) > 0)
    """,
)
def udtf_token_positions(spark: SparkSession, sf: str) -> DataFrame:
    """User-defined TABLE function surface: a Python UDTF (one row in,
    N rows out) tokenizing each document — the reference's mapper
    shape (line -> token pairs, mapper_word_count.py:11-22) expressed
    through Spark's UDTF API instead of explode, proving arbitrary
    user Python can own the row-expansion step too."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class Tokenize:
        def eval(self, text: str):  # noqa: A002
            if text is None:
                return
            pos = 0
            for tok in text.split(" "):
                if tok:
                    yield pos, tok, len(tok)
                    pos += 1

    spark.udtf.register("tokenize_udtf", Tokenize)
    t(spark, sf, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, tk.pos, tk.token, tk.token_len
        FROM __docs_udtf d, LATERAL tokenize_udtf(d.text) tk
        """
    )


@query(
    "profile_columns",
    oracle="""
    SELECT 'l_quantity' AS col,
           count(*) AS n_rows,
           count(l_quantity) AS n_non_null,
           count(DISTINCT l_quantity) AS n_distinct,
           round(min(l_quantity), 4) AS min_v,
           round(max(l_quantity), 4) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(l_discount),
           count(DISTINCT l_discount),
           round(min(l_discount), 4), round(max(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4)
    FROM lineitem
    """,
)
def profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Data-profiling audit (the pre-ingest sanity pass a pipeline
    runs on every new source): per-column null/distinct/min/max in ONE
    scan — the per-column stats are stacked with a literal-array
    explode, not one scan per column like the naive UNION ALL."""
    li = t(spark, sf, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    per = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in cols
            for e in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.round(F.min(c), 4).alias(f"mn_{c}"),
                F.round(F.max(c), 4).alias(f"mx_{c}"),
            )
        ],
    )
    stacked = per.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"nn_{c}").alias("n_non_null"),
                        F.col(f"nd_{c}").alias("n_distinct"),
                        F.col(f"mn_{c}").alias("min_v"),
                        F.col(f"mx_{c}").alias("max_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


@query(
    "join_full_outer_balance_orders",
    oracle="""
    WITH rich AS (
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal >= 5000),
    o95 AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS spend_cents
      FROM orders WHERE o_orderdate BETWEEN DATE '1995-01-01'
                                        AND DATE '1995-12-31'
      GROUP BY o_custkey)
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           c_name,
           c_custkey IS NOT NULL AS has_profile,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(spend_cents, 0) AS spend_cents
    FROM rich FULL OUTER JOIN o95 ON c_custkey = o_custkey
    """,
)
def join_full_outer_balance_orders(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join — the one join type the battery in
    relational.py (inner/left/semi/anti/broadcast) didn't cover:
    high-balance customer profiles against 1995 order activity, where
    each side genuinely has keys the other lacks (rich customers with
    no 1995 orders; active 1995 customers below the balance cut), so
    both null-extension directions are exercised.  Money is summed in
    exact cents (ORACLE_PORTABILITY 'double sums merged
    incrementally').  Scale: the order side pre-aggregates to one row
    per customer BEFORE the join, so the full-outer shuffle carries
    customer-cardinality rows, not order-cardinality; both sides
    hash-partition on custkey."""
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    rich = cust.filter(F.col("c_acctbal") >= 5000).select(
        "c_custkey", "c_name"
    )
    o95 = (
        orders.filter(
            F.col("o_orderdate").between("1995-01-01", "1995-12-31")
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("spend_cents"),
        )
    )
    j = rich.join(o95, rich.c_custkey == o95.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        F.col("c_custkey").isNotNull().alias("has_profile"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("spend_cents", F.lit(0)).cast("long").alias("spend_cents"),
    )


@query(
    "window_rank_battery",
    oracle="""
    WITH ranked AS (
      SELECT event_type, event_id,
             row_number() OVER w AS rn,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             count(*) OVER (PARTITION BY event_type) AS n,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(round(value * 100) AS BIGINT), event_id))
    SELECT event_type, event_id, rnk AS rnk, drnk AS drnk,
           CASE WHEN n > 1
                THEN CAST(floor((rnk - 1) * 1e6 / (n - 1)) AS BIGINT)
                ELSE 0 END
             AS percent_rank_e6,
           CAST(floor(rn * 1e6 / n) AS BIGINT) AS cume_ub_e6
    FROM ranked
    WHERE rn <= 20
    """,
)
def window_rank_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-function battery — row_number / rank / dense_rank /
    percent_rank / cumulative fraction over one shared window,
    value-tied rows made deterministic two ways: the ORDER BY key is
    exact cents (never raw doubles) with an event_id tiebreak, and
    the fractional ranks are recomputed from INTEGER rank and n
    ((rnk-1)·1e6/(n-1) floored) rather than taken from the engines'
    percent_rank()/cume_dist(), whose tie semantics and double
    division are not bit-portable.  One (event_type) shuffle serves
    all five functions (WindowExec evaluates them in a single pass
    over the shared frame); output capped to each group's first 20
    rows so the check stays row-bounded at any SF."""
    ev = t(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = W.partitionBy("event_type").orderBy(cents, "event_id")
    wc = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") <= 20)
        .select(
            "event_type",
            "event_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("drnk").cast("long").alias("drnk"),
            # n=1 guard (ADVICE r04): 0.0/0.0 is NaN in Spark (floor →
            # 0 under non-ANSI) but NULL in DuckDB — pin both to 0.
            F.when(
                F.col("n") > 1,
                F.floor((F.col("rnk") - 1) * 1e6 / (F.col("n") - 1)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("percent_rank_e6"),
            F.floor(F.col("rn") * 1e6 / F.col("n"))
            .cast("long")
            .alias("cume_ub_e6"),
        )
    )


_LC_K = 4096  # linear-counting bucket space


def _lc_oracle() -> str:
    from .llm3 import _md5_u32_sql

    # arithmetic hex decode (_md5_u32_sql), NOT CAST('0x..' AS BIGINT):
    # the cast form needs DuckDB >= 0.10 (ORACLE_PORTABILITY.md)
    return f"""
    WITH b AS (
      SELECT DISTINCT {_md5_u32_sql("lc", "o_custkey")} % {_LC_K} AS bkt
      FROM orders),
    e AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd
          FROM orders)
    SELECT CAST({_LC_K} AS BIGINT) AS k,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS v_occupied,
           exact_nd
    FROM e
    """


@query("approx_distinct_linear_portable", oracle=_lc_oracle())
def approx_distinct_linear_portable(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-counting distinct sketch with a PORTABLE hash — the
    oracle-checkable twin of approx_count_distinct (whose HLL++
    registers are engine-internal): hash each o_custkey into one of
    4096 md5-derived buckets; the sketch state is the OCCUPIED-BUCKET
    count V, a pure integer both engines reproduce bit-for-bit.  The
    estimator  n̂ = −K·ln(1 − V/K)  is evaluated in the TEST (within
    tolerance of exact), not in the hash — ln() is libm-dependent and
    the one thing here that is not bit-portable.  exact_nd rides
    along so the artifact shows sketch-vs-truth at a glance.  Scale:
    the sketch is a 4096-cell bitmap — DISTINCT on the bucket id
    reduces map-side to ≤K rows per partition, then one tiny
    aggregate; mergeable across any partitioning, which is the whole
    point of sketches at 100 TB (HLL's union = max is the production
    path; this is the checkable baseline)."""
    from .llm3 import _md5_u32

    orders = t(spark, sf, "orders")
    bkt = (_md5_u32("lc", F.col("o_custkey")) % _LC_K).alias("bkt")
    v = orders.select(bkt).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("v_occupied")
    )
    e = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_nd")
    )
    return v.crossJoin(e).select(
        F.lit(_LC_K).cast("long").alias("k"), "v_occupied", "exact_nd"
    )


_SKEW_TOPK = 10


@query(
    "join_key_skew_profile",
    oracle=f"""
    WITH freq AS (
      SELECT o_custkey AS key, count(*) AS c
      FROM orders GROUP BY o_custkey),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(max(c) AS BIGINT) AS max_c
      FROM freq)
    SELECT f.key, CAST(f.c AS BIGINT) AS c, s.n_keys, s.n_rows,
           CAST(floor(CAST(f.c AS DOUBLE) * s.n_keys / s.n_rows * 1e4)
                AS BIGINT) AS skew_x_e4
    FROM freq f CROSS JOIN stats s
    ORDER BY f.c DESC, f.key
    LIMIT {_SKEW_TOPK}
    """,
)
def join_key_skew_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew profiler: the top heavy-hitter keys of
    orders.o_custkey with each key's frequency and its skew factor
    (frequency / mean frequency, 1e-4 ticks) — the diagnostic run
    BEFORE choosing a mitigation (broadcast the other side, salt this
    key — operators/skew.py — or lean on AQE skew-join).  At 100 TB
    the per-key aggregate reduces map-side and the global stats row
    broadcasts; only the top-k survive the limit, so the output is
    bounded at any scale.  The skew factor's only double op is one
    multiply-divide chain on identical integers."""
    orders = t(spark, sf, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
    )
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("c").cast("long").alias("c"),
            "n_keys",
            "n_rows",
            F.floor(
                F.col("c").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
                * 1e4
            ).cast("long").alias("skew_x_e4"),
        )
        .orderBy(F.desc("c"), "key")
        .limit(_SKEW_TOPK)
    )


@query(
    "grouped_map_streaks",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} events),
    o AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY us, event_id) AS rn,
             lag(cents) OVER (PARTITION BY event_type
                              ORDER BY us, event_id) AS pc
      FROM e),
    m AS (
      SELECT event_type, rn,
             CASE WHEN pc IS NULL OR cents <= pc THEN 1 ELSE 0 END AS brk
      FROM o),
    g AS (
      SELECT event_type,
             sum(brk) OVER (PARTITION BY event_type ORDER BY rn
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM m),
    r AS (SELECT event_type, grp, count(*) AS len FROM g GROUP BY 1, 2)
    SELECT event_type, CAST(max(len) AS BIGINT) AS longest_run,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM r GROUP BY 1
    """,
)
def grouped_map_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map Pandas API (``applyInPandas``) with a hash-grade
    oracle: per event type, the longest strictly-increasing streak of
    values (in exact cents, ordered by ts then event_id) and the total
    number of maximal runs — the gaps-and-islands statistic.  The
    Spark side is per-group IMPERATIVE pandas (sort, diff, cumsum of
    breaks — the reference's per-partition style of logic,
    /root/reference/mapper_word_count.py:11-35, expressed in the API
    Spark provides for it), while the DuckDB twin is the classic SQL
    islands formulation — two independent formulations agreeing
    bit-for-bit.  Everything is integer, and the (us, event_id) order
    is total, so both sides are deterministic.  Scale: grouped-map
    BUFFERS each group in pandas (Arrow-batched) — fine for bounded
    categorical groups; for unbounded groups the oracle's own
    window-cumsum shape (islands via running break-count, one ordered
    window, then two bounded aggregates) IS the scale path — use it
    JVM-side, exactly as written, when a group can exceed a task."""
    ev = t(spark, sf, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def streaks(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
        c = pdf["cents"].to_numpy()
        if len(c) == 0:
            return pd.DataFrame(
                {"event_type": [], "longest_run": [], "n_runs": []}
            )
        import numpy as np

        brk = np.ones(len(c), dtype=np.int64)
        if len(c) > 1:
            brk[1:] = (c[1:] <= c[:-1]).astype(np.int64)
        grp = brk.cumsum()
        lens = pd.Series(grp).value_counts()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "longest_run": [int(lens.max())],
                "n_runs": [int(lens.size)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        streaks, schema="event_type string, longest_run long, n_runs long"
    )


_HLL_M = 64  # registers; ~13% rel. std error — the CHECKABLE baseline
_HLL_WBITS = 26  # md5_u32 div 64 leaves 26 bits for the rho pattern


def _hll_oracle() -> str:
    from .llm3 import _md5_u32_sql

    h = _md5_u32_sql("hll", "o_custkey")
    return f"""
    WITH ks AS (SELECT DISTINCT o_custkey FROM orders),
    hw AS (
      SELECT {h} % {_HLL_M} AS bkt, {h} // {_HLL_M} AS w FROM ks),
    r AS (
      SELECT bkt,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE strpos(lpad(bin(w), {_HLL_WBITS}, '0'), '1')
                 END) AS m_j
      FROM hw GROUP BY bkt),
    s AS (
      SELECT CAST(sum(CAST(power(2, {_HLL_WBITS + 1} - m_j) AS BIGINT))
                  AS BIGINT) AS s_occ,
             CAST(count(*) AS BIGINT) AS occupied
      FROM r),
    e AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd
          FROM orders)
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           s.s_occ + ({_HLL_M} - s.occupied)
                     * CAST(power(2, {_HLL_WBITS + 1}) AS BIGINT) AS s_pow,
           CAST({_HLL_M} - s.occupied AS BIGINT) AS v_zero,
           e.exact_nd
    FROM s CROSS JOIN e
    """


@query("approx_distinct_hll_portable", oracle=_hll_oracle())
def approx_distinct_hll_portable(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog with a PORTABLE hash — closes the last sketch class
    without hash-grade evidence (approx_count_distinct's HLL++
    registers are engine-internal; approx_distinct_linear_portable
    checks only the linear-counting regime).  Each distinct o_custkey
    hashes (md5) into one of 64 registers; the register value is the
    1-based position of the first set bit in the remaining 26 hash
    bits (rho, via the engine-agreeing bin()/lpad/strpos chain — no
    log2, whose libm rounding at exact powers is not portable).  The
    OUTPUT is pure-integer sketch state: Σ 2^(27−M_j) over all 64
    registers (empty registers contribute 2^27) — exact in int64
    (≤ 64·2^27) and ORDER-INDEPENDENT, so both engines reproduce it
    bit-for-bit.  The estimate α·m²·2^27/s_pow (+ the small-range
    linear-counting correction) is evaluated in the unit test against
    exact_nd, following the linear-twin precedent: estimator math is
    libm; sketch state is the contract.  Scale: max() registers are
    map-side combinable and HLL union = register-wise max — the
    mergeable-sketch property that makes it THE 100 TB distinct-count
    structure."""
    from .llm3 import _md5_u32

    orders = t(spark, sf, "orders")
    h = _md5_u32("hll", F.col("o_custkey"))
    hw = (
        orders.select("o_custkey")
        .distinct()
        .select(h.alias("h"))
        .select(
            (F.col("h") % _HLL_M).alias("bkt"),
            F.expr(f"h div {_HLL_M}").alias("w"),
        )
    )
    r = hw.groupBy("bkt").agg(
        F.expr(
            f"max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}"
            f" ELSE instr(lpad(bin(w), {_HLL_WBITS}, '0'), '1') END)"
        ).alias("m_j")
    )
    s = r.agg(
        F.sum(
            F.expr(f"CAST(power(2, {_HLL_WBITS + 1} - m_j) AS BIGINT)")
        ).cast("long").alias("s_occ"),
        F.count(F.lit(1)).cast("long").alias("occupied"),
    )
    e = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_nd")
    )
    return s.crossJoin(F.broadcast(e)).select(
        F.lit(_HLL_M).cast("long").alias("m"),
        (
            F.col("s_occ")
            + (F.lit(_HLL_M) - F.col("occupied"))
            * F.lit(2 ** (_HLL_WBITS + 1))
        ).cast("long").alias("s_pow"),
        (F.lit(_HLL_M) - F.col("occupied")).cast("long").alias("v_zero"),
        "exact_nd",
    )


_KMV_K = 32
_TWO32 = 4_294_967_296


def _kmv_oracle() -> str:
    from .llm3 import _md5_u32_sql

    h = _md5_u32_sql("kmv", "o_custkey")
    return f"""
    WITH ks AS (SELECT DISTINCT o_custkey FROM orders),
    hs AS (SELECT {h} AS h FROM ks),
    tk AS (SELECT h FROM hs ORDER BY h LIMIT {_KMV_K}),
    s AS (SELECT max(h) AS kth, count(*) AS got FROM tk),
    e AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd
          FROM orders)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(s.got AS BIGINT) AS got,
           CAST(s.kth AS BIGINT) AS kth_min,
           CAST(CASE WHEN s.got < {_KMV_K} THEN s.got
                WHEN s.kth = 0 THEN 0
                ELSE ({_KMV_K - 1} * {_TWO32}) // s.kth
                END AS BIGINT) AS est_kmv,
           e.exact_nd
    FROM s CROSS JOIN e
    """


@query("approx_distinct_kmv_portable", oracle=_kmv_oracle())
def approx_distinct_kmv_portable(spark: SparkSession, sf: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (K=32) with a portable
    hash — the third checkable sketch family next to the HLL and
    linear-counting twins, and the one whose state is literally a
    top-k: the K smallest md5-u32 hashes of the key set.  The
    estimate is the classic (K−1)/θ̂ with θ̂ = kth_min/2^32, published
    as an exact integer floor division ((K−1)·2^32 // kth_min —
    ≤ 1.4e11, comfortable int64); below K distinct keys the sketch is
    exact by definition.  The kth value of the globally sorted hash
    stream is a deterministic multiset statistic, so both engines
    agree bit-for-bit; exact_nd rides along for the accuracy check
    (tests/test_brute_force_r06.py evaluates the estimator error).

    Scale: ORDER BY h LIMIT K is Spark's TakeOrdered — per-partition
    top-K then a K·P-row driver merge, no global sort; KMV union is
    "K smallest of the union", the mergeable-sketch property that
    lets a 100 TB scan combine per-split sketches associatively."""
    from .llm3 import _md5_u32

    orders = t(spark, sf, "orders")
    hs = (
        orders.select("o_custkey")
        .distinct()
        .select(_md5_u32("kmv", F.col("o_custkey")).alias("h"))
    )
    s = (
        hs.orderBy("h")
        .limit(_KMV_K)
        .agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).alias("got"),
        )
    )
    e = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_nd")
    )
    return s.crossJoin(F.broadcast(e)).select(
        F.lit(_KMV_K).cast("long").alias("k"),
        F.col("got").cast("long"),
        F.col("kth").cast("long").alias("kth_min"),
        F.when(F.col("got") < _KMV_K, F.col("got"))
        .when(F.col("kth") == 0, F.lit(0))
        .otherwise(
            F.expr(f"({_KMV_K - 1} * {_TWO32}) div kth")
        )
        .cast("long")
        .alias("est_kmv"),
        "exact_nd",
    )


@query(
    "bucketed_join_lineitem_orders",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_c
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_lineitem_orders(spark: SparkSession, sf: str) -> DataFrame:
    """The co-located join: orders and lineitem are materialized ONCE
    as 8-bucket tables clustered+sorted on the order key
    (operators/bucketed.py — write-time hash partitioning, the
    layout a 100 TB lake bakes into its fact tables), then joined
    WITHOUT any Exchange on either side: Spark matches the two
    bucketing specs and feeds the SortMergeJoin directly from the
    bucketed files (tests/test_bucketed.py pins the executed plan
    shuffle-free).  The aggregate is the usual exact-cents revenue
    per order status, so the result is oracle-checkable against the
    raw parquet — identical answer, structurally cheaper plan.

    Scale: bucketing replaces the per-query fact shuffle with a
    one-time write investment amortized over every key-aligned join /
    agg / dedup that follows; at 1000 executors it also fixes the
    join's parallelism to the bucket count, so n is a layout
    parameter (here 8 for the test corpus; a real lake sizes it to
    cluster width)."""
    from ..operators.bucketed import bucketed_table

    o = bucketed_table(spark, sf, "orders", "o_orderkey", 8)
    li = bucketed_table(spark, sf, "lineitem", "l_orderkey", 8)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).cast("long").alias("revenue_c"),
        )
    )


_DAY_US_HLL = 86_400_000_000


def _hll_daily_oracle() -> str:
    from .llm3 import _md5_u32_sql

    h = _md5_u32_sql("hlld", "user_id")
    return f"""
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // {_DAY_US_HLL} AS day, user_id
      FROM {EVENTS_US} events),
    hw AS (
      SELECT day, {h} % {_HLL_M} AS bkt, {h} // {_HLL_M} AS w FROM du),
    rd AS (
      SELECT day, bkt,
             max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                      ELSE strpos(lpad(bin(w), {_HLL_WBITS}, '0'), '1')
                 END) AS m_j
      FROM hw GROUP BY day, bkt),
    days AS (SELECT DISTINCT day FROM du),
    grid AS (
      SELECT days.day, CAST(range AS BIGINT) AS bkt
      FROM days CROSS JOIN range({_HLL_M})),
    cum AS (
      SELECT g.day, g.bkt,
             max(rd.m_j) OVER
               (PARTITION BY g.bkt ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cm
      FROM grid g LEFT JOIN rd ON rd.day = g.day AND rd.bkt = g.bkt),
    sd AS (
      SELECT day,
             CAST(coalesce(sum(CASE WHEN cm IS NOT NULL THEN
                    CAST(power(2, {_HLL_WBITS + 1} - cm) AS BIGINT)
                  END), 0)
                  + count(CASE WHEN cm IS NULL THEN 1 END)
                    * CAST(power(2, {_HLL_WBITS + 1}) AS BIGINT)
                  AS BIGINT) AS s_pow,
             CAST(count(CASE WHEN cm IS NULL THEN 1 END) AS BIGINT)
               AS v_zero
      FROM cum GROUP BY day),
    fu AS (SELECT user_id, min(day) AS fd FROM du GROUP BY user_id),
    fc AS (SELECT fd, count(*) AS n FROM fu GROUP BY fd),
    ex AS (
      SELECT days.day,
             CAST(sum(coalesce(fc.n, 0)) OVER
               (ORDER BY days.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS exact_cum_nd
      FROM days LEFT JOIN fc ON fc.fd = days.day)
    SELECT CAST(sd.day AS BIGINT) AS day, sd.s_pow, sd.v_zero,
           ex.exact_cum_nd
    FROM sd JOIN ex ON ex.day = sd.day
    """


@query("hll_merge_daily_users", oracle=_hll_daily_oracle())
def hll_merge_daily_users(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative daily distinct-user curve via HLL SKETCH MERGE — the
    operational proof of the property the static HLL twin only
    documents: union = register-wise max.  Each day's 64-register
    sketch is built independently (map-side-combinable max of the
    portable md5 rho), then the day-d cumulative sketch is the
    running register-wise max over day order — exactly how a 100 TB
    deployment maintains daily/rolling distinct counts without ever
    re-scanning history (merge sketches, never data).  The published
    state is the same pure-integer contract as
    approx_distinct_hll_portable (sum of 2^(27-M_j) + empty-register
    count, order-independent, bit-exact), per day, alongside the
    exact cumulative distinct (first-seen-day cumulative sum) the
    unit test evaluates the estimator against.

    Scale: ONE events scan reduces to (day, user) pairs, then (day x
    64) registers; the cumulative max window runs over the
    register-bounded grid (days x 64 rows, aggregate below — lint-
    safe low-cardinality partition), and the exact twin is a
    first-touch aggregate plus a days-bounded running sum."""
    from .llm3 import _md5_u32

    du = (
        t(spark, sf, "events")
        .select(
            F.expr(f"unix_micros(ts) div {_DAY_US_HLL}").alias("day"),
            "user_id",
        )
        .distinct()
    ).persist()  # feeds the sketch build AND the exact first-touch twin
    h = _md5_u32("hlld", F.col("user_id"))
    hw = du.select("day", h.alias("h")).select(
        "day",
        (F.col("h") % _HLL_M).alias("bkt"),
        F.expr(f"h div {_HLL_M}").alias("w"),
    )
    rd = hw.groupBy("day", "bkt").agg(
        F.expr(
            f"max(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}"
            f" ELSE instr(lpad(bin(w), {_HLL_WBITS}, '0'), '1') END)"
        ).alias("m_j")
    )
    days = du.select("day").distinct()
    grid = days.select(
        "day",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(_HLL_M - 1).cast("long")
            )
        ).alias("bkt"),
    )
    wb = (
        W.partitionBy("bkt")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = grid.join(rd, ["day", "bkt"], "left").withColumn(
        "cm", F.max("m_j").over(wb)
    )
    sd = cum.groupBy("day").agg(
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cm").isNotNull(),
                        F.expr(
                            f"CAST(power(2, {_HLL_WBITS + 1} - cm)"
                            " AS BIGINT)"
                        ),
                    )
                ),
                F.lit(0),
            )
            + F.sum(
                F.when(F.col("cm").isNull(), 1).otherwise(0)
            ) * F.lit(2 ** (_HLL_WBITS + 1))
        ).cast("long").alias("s_pow"),
        F.sum(F.when(F.col("cm").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
    )
    fu = du.groupBy("user_id").agg(F.min("day").alias("fd"))
    fc = fu.groupBy("fd").agg(F.count(F.lit(1)).alias("n"))
    wd = W.orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ex = (
        days.join(fc, days["day"] == fc["fd"], "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("exact_cum_nd", F.sum("n").over(wd))
    )
    return sd.join(ex.select("day", "exact_cum_nd"), "day").select(
        F.col("day").cast("long"),
        "s_pow",
        "v_zero",
        F.col("exact_cum_nd").cast("long"),
    )


_AMS_R = 16


def _ams_oracle() -> str:
    from .llm3 import _md5_u32_sql

    z_cols = ", ".join(
        f"sum((1 - 2 * ({_md5_u32_sql(f'ams{r}', 'l_partkey')} % 2))"
        f" * cnt) AS z{r}"
        for r in range(_AMS_R)
    )
    z2 = " + ".join(f"z{r} * z{r}" for r in range(_AMS_R))
    return f"""
    WITH c AS (
      SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
    s AS (
      SELECT count(*) AS n_keys, sum(cnt * cnt) AS f2_exact, {z_cols}
      FROM c)
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(f2_exact AS BIGINT) AS f2_exact,
           CAST({z2} AS BIGINT) AS sum_z2,
           CAST(({z2}) // {_AMS_R} AS BIGINT) AS est_f2
    FROM s
    """


@query("ams_f2_selfjoin_size", oracle=_ams_oracle())
def ams_f2_selfjoin_size(spark: SparkSession, sf: str) -> DataFrame:
    """Alon-Matias-Szegedy F2 sketch estimating the lineitem
    SELF-JOIN SIZE on l_partkey (F2 = sum of squared key frequencies
    — what a cost-based optimizer wants before planning a many-many
    join, and the second frequency moment the AMS paper introduced).
    Sixteen independent {{-1,+1}} sign functions (one md5 tag per
    replicate) fold the whole frequency vector into 16 integers
    Z_r = sum s_r(k) c(k); E[Z_r^2] = F2, and the published estimate
    is the exact integer mean sum(Z_r^2) div 16 next to the exact F2
    for calibration.  Everything is int64 (|Z| <= total rows;
    Z^2 <= ~4e17 at the 100x replica — inside the audit margin), so
    the sketch state is bit-portable with zero float surface.

    Scale: ONE aggregate pass over the key-frequency table computes
    all 16 replicates as parallel sum() columns — map-side
    combinable, no explode, no join; the sketch is O(R) state per
    partition, the textbook streaming shape.  (The exact F2 column is
    the same single pass; at 100 TB you would publish only the
    sketch.)"""
    from .llm3 import _md5_u32

    c = (
        t(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2_exact"),
    ] + [
        F.sum(
            (
                F.lit(1)
                - F.lit(2) * (_md5_u32(f"ams{r}", F.col("l_partkey")) % 2)
            )
            * F.col("cnt")
        ).cast("long").alias(f"z{r}")
        for r in range(_AMS_R)
    ]
    s = c.agg(*aggs)
    z2 = None
    for r in range(_AMS_R):
        term = F.col(f"z{r}") * F.col(f"z{r}")
        z2 = term if z2 is None else z2 + term
    return s.select(
        "n_keys",
        "f2_exact",
        z2.cast("long").alias("sum_z2"),
        F.expr(
            "CAST(("
            + " + ".join(f"z{r} * z{r}" for r in range(_AMS_R))
            + f") div {_AMS_R} AS BIGINT)"
        ).alias("est_f2"),
    )
