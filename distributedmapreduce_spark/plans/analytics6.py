"""Round-6 analytics battery #10: rank correlation, privacy EMD,
per-node graph structure, time-series symbolization, and
deterministic-hash resampling (Poisson bootstrap + permutation test).

Same portability discipline as the earlier batteries: money is BIGINT
cents, ranks are doubled to stay integral under midrank ties, every
published ratio is an integer tick division, and the one unavoidable
double (Spearman's sqrt) is a single textual chain both engines
evaluate on identical BIGINT sufficient statistics (the
lineitem_corr_matrix / CUPED discipline).  Resampling weights come
from the md5-u32 portable uniform (llm3._md5_u32) so both engines
draw the SAME bootstrap replicates and permutations — determinism is
what makes resampling oracle-checkable at all.

Reference parity note: the reference engine
(ParitoshSabade/DistributedMapReduce) exposes only map/reduce
word-count jobs (mapper_word_count.py:11-35); these queries are the
extension surface SURVEY.md §2.2 declares.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .analytics2 import _LPA_EDGES_SQL, copurchase_edges
from .core import EVENTS_US, query, t
from .llm3 import _md5_u32, _md5_u32_sql

# --- Spearman: the double chain both engines evaluate on identical
# BIGINT sums (rank sums use DOUBLED midranks, so everything up to
# the final rho is exact integer arithmetic).
_RHO_NUM = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
# outer parens are load-bearing: without them `num / den` parses as
# (num / sqrt(..)) * sqrt(..) — left-to-right — which BOTH engines
# evaluate identically (hash-green!) and identically wrong; the
# brute-force gate caught it (tests/test_brute_force_analytics6.py)
_RHO_DEN = (
    "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)
_RHO_E6 = (
    f"CASE WHEN {_RHO_DEN} = 0 THEN 0 ELSE "
    f"CAST(floor({_RHO_NUM} / {_RHO_DEN} * 1000000) AS BIGINT) END"
)


@query(
    "spearman_rho_qty_price",
    oracle=f"""
    WITH li AS (
      SELECT p.p_brand AS brand, l.l_quantity AS q,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    hx AS (SELECT brand, q, CAST(count(*) AS BIGINT) AS c
           FROM li GROUP BY 1, 2),
    rx AS (
      SELECT brand, q,
             2 * coalesce(sum(c) OVER (PARTITION BY brand ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2
      FROM hx),
    hy AS (SELECT brand, pc, CAST(count(*) AS BIGINT) AS c
           FROM li GROUP BY 1, 2),
    ry AS (
      SELECT brand, pc,
             2 * coalesce(sum(c) OVER (PARTITION BY brand ORDER BY pc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS r2
      FROM hy),
    st AS (
      SELECT li.brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx.r2) AS BIGINT) AS sx,
             CAST(sum(ry.r2) AS BIGINT) AS sy,
             sum(CAST(rx.r2 AS HUGEINT) * rx.r2) AS sxx,
             sum(CAST(ry.r2 AS HUGEINT) * ry.r2) AS syy,
             sum(CAST(rx.r2 AS HUGEINT) * ry.r2) AS sxy
      FROM li
      JOIN rx ON rx.brand = li.brand AND rx.q = li.q
      JOIN ry ON ry.brand = li.brand AND ry.pc = li.pc
      GROUP BY 1)
    SELECT brand AS p_brand, n, {_RHO_E6} AS rho_e6 FROM st
    """,
)
def spearman_rho_qty_price(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Spearman rank correlation between quantity and extended
    price per brand — completes the correlation battery (Pearson:
    lineitem_corr_matrix; Kendall: kendall_tau_qty_price).  Midrank
    ties use DOUBLED average ranks (r2 = 2·cnt_below + cnt_eq + 1),
    so every rank and every sufficient statistic is an exact BIGINT;
    rho itself is the one double, evaluated as a single textual chain
    on identical int64 sums in both engines (the CUPED discipline),
    published as floor(rho·1e6).

    Scale: ranks are computed on the per-brand VALUE HISTOGRAMS
    (quantity: ≤ 50 distinct; price: bounded by the cents domain,
    never by row count), so the only windows run over
    histogram-sized tables; raw rows take two broadcast-able
    histogram joins and one aggregate.  Width audit: r2 ≤ 2n stays
    BIGINT, but the squared-rank sums reach 4n³ ≈ 5.5e19 per brand at
    the 100× replica (n ≈ 2.4M) — past int64, so sxx/syy/sxy
    accumulate in 128-bit integers (Spark decimal(38,0) == DuckDB
    HUGEINT; the 100× gate caught the BIGINT draft with
    ARITHMETIC_OVERFLOW, exactly what ANSI-on oracle runs are for);
    the n·sxy cross-term then runs in the double chain.  decimal(38)
    headroom holds to ~1e10 rows per brand."""
    li = (
        t(spark, sf, "lineitem")
        .join(
            t(spark, sf, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.col("l_quantity").alias("q"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("pc"),
        )
        # three consumers (two histograms + the rank join) — persist
        # the projected join so the executed plan carries ONE
        # lineitem/part FileScan instead of three
        .persist()
    )

    def _ranks(col: str) -> DataFrame:
        h = li.groupBy("brand", col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        wb = W.partitionBy("brand").orderBy(col).rowsBetween(
            W.unboundedPreceding, -1
        )
        return h.select(
            "brand",
            col,
            (
                2 * F.coalesce(F.sum("c").over(wb), F.lit(0))
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    rx = _ranks("q").withColumnRenamed("r2", "r2x")
    ry = _ranks("pc").withColumnRenamed("r2", "r2y")
    st = (
        li.join(rx, ["brand", "q"])
        .join(ry, ["brand", "pc"])
        .groupBy(F.col("brand").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r2x").cast("long").alias("sx"),
            F.sum("r2y").cast("long").alias("sy"),
            # int128-width sums: r2·r2 sums reach 4n³ ≈ 5.5e19 per
            # brand at the 100× replica — past int64 (the 100× gate
            # caught the BIGINT draft with ARITHMETIC_OVERFLOW).
            # decimal(38,0) here == HUGEINT in the DuckDB twin; the
            # rho chain casts both to DOUBLE identically.
            F.sum(
                F.col("r2x").cast("decimal(19,0)") * F.col("r2x")
            ).alias("sxx"),
            F.sum(
                F.col("r2y").cast("decimal(19,0)") * F.col("r2y")
            ).alias("syy"),
            F.sum(
                F.col("r2x").cast("decimal(19,0)") * F.col("r2y")
            ).alias("sxy"),
        )
    )
    return st.select("p_brand", "n", F.expr(_RHO_E6).alias("rho_e6"))


# --- t-closeness: tick-quantized ordered EMD between each
# quasi-identifier class's sensitive-attribute distribution and the
# global one.  Completes the privacy triad (k_anonymity_audit,
# l_diversity_audit).
_TC_BUCKETS = 11  # acctbal cents shifted non-negative, $1000 buckets
_TC_T_E6 = 200_000  # flag classes with EMD > 0.2


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH c AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
               AS b
      FROM customer),
    cls AS (SELECT nation, segment, b, CAST(count(*) AS BIGINT) AS cnt
            FROM c GROUP BY 1, 2, 3),
    grid AS (
      SELECT k.nation, k.segment, r.range AS b
      FROM (SELECT DISTINCT nation, segment FROM cls) k
      CROSS JOIN range(0, {_TC_BUCKETS}) r),
    gc AS (
      SELECT g.nation, g.segment, g.b,
             sum(coalesce(cls.cnt, 0)) OVER (
               PARTITION BY g.nation, g.segment ORDER BY g.b) AS cum,
             sum(coalesce(cls.cnt, 0)) OVER (
               PARTITION BY g.nation, g.segment) AS n
      FROM grid g LEFT JOIN cls
        ON cls.nation = g.nation AND cls.segment = g.segment
       AND cls.b = g.b),
    gb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cnt FROM cls GROUP BY 1),
    gg AS (
      SELECT r.range AS b,
             sum(coalesce(gb.cnt, 0)) OVER (ORDER BY r.range) AS gcum,
             sum(coalesce(gb.cnt, 0)) OVER () AS tot
      FROM range(0, {_TC_BUCKETS}) r LEFT JOIN gb ON gb.b = r.range)
    SELECT gc.nation, gc.segment, CAST(min(gc.n) AS BIGINT) AS n_class,
           CAST(sum(abs(gc.cum * 1000000 // gc.n
                        - gg.gcum * 1000000 // gg.tot))
                // {_TC_BUCKETS - 1} AS BIGINT) AS emd_e6,
           CAST(CASE WHEN sum(abs(gc.cum * 1000000 // gc.n
                                  - gg.gcum * 1000000 // gg.tot))
                          // {_TC_BUCKETS - 1} > {_TC_T_E6}
                THEN 1 ELSE 0 END AS BIGINT) AS t_flag
    FROM gc JOIN gg ON gg.b = gc.b
    WHERE gc.b < {_TC_BUCKETS - 1}
    GROUP BY 1, 2
    """,
)
def t_closeness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): for each
    quasi-identifier class (nation × market segment), the earth-mover
    distance between its account-balance distribution and the global
    one, over the ORDERED $1000-bucket domain — the ordinal-EMD form
    Σ|cumP − cumQ| / (m−1).  Cumulative fractions are quantized to
    1e-6 integer ticks BEFORE the difference (both engines truncate
    identically), so the published EMD is a defined integer metric
    with no float anywhere; classes with EMD > 0.2 carry t_flag = 1.
    Buckets are (cents + 100000) // 100000 — the shift keeps the
    dividend non-negative, where Spark's truncating `div` and
    DuckDB's flooring `//` agree.  Completes the privacy triad with
    k_anonymity_audit and l_diversity_audit.

    Scale: one customer scan → (class, bucket) counts; everything
    after runs on the class×bucket grid (classes × 11 rows — grid
    cardinality is quasi-identifier-bounded, never row-bounded), with
    all windows over that grid.  The missing-bucket zero rows are
    materialized from a literal range so flat cumulative segments
    contribute their |cum diff| — dropping them would under-count the
    EMD."""
    c = t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT) + 100000)"
            " div 100000"
        ).alias("b"),
    )
    # the class×bucket count table is tiny (classes × 11) and feeds
    # three consumers (grid keys, the left join, the global margin) —
    # persist it so the plan carries ONE customer FileScan
    cls = c.groupBy("nation", "segment", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).persist()
    grid = (
        cls.select("nation", "segment")
        .distinct()
        .select(
            "nation",
            "segment",
            F.explode(F.sequence(F.lit(0), F.lit(_TC_BUCKETS - 1))).alias(
                "b"
            ),
        )
    )
    wc = (
        W.partitionBy("nation", "segment")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    gc = (
        grid.join(cls, ["nation", "segment", "b"], "left")
        .withColumn("cnt0", F.coalesce(F.col("cnt"), F.lit(0)))
        .select(
            "nation",
            "segment",
            "b",
            F.sum("cnt0").over(wc).alias("cum"),
            F.sum("cnt0")
            .over(W.partitionBy("nation", "segment"))
            .alias("n"),
        )
    )
    gb = cls.groupBy("b").agg(F.sum("cnt").cast("long").alias("cnt"))
    gdom = spark.range(0, _TC_BUCKETS).select(F.col("id").alias("b"))
    wg = W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    gg = (
        gdom.join(gb, "b", "left")
        .withColumn("cnt0", F.coalesce(F.col("cnt"), F.lit(0)))
        .select(
            "b",
            F.sum("cnt0").over(wg).alias("gcum"),
            F.sum("cnt0").over(W.partitionBy()).alias("tot"),
        )
    )
    terms = (
        gc.join(gg, "b")
        .filter(F.col("b") < _TC_BUCKETS - 1)
        .select(
            "nation",
            "segment",
            "n",
            F.abs(
                F.expr("cum * 1000000 div n")
                - F.expr("gcum * 1000000 div tot")
            ).alias("d"),
        )
    )
    return terms.groupBy("nation", "segment").agg(
        F.min("n").cast("long").alias("n_class"),
        F.expr(f"sum(d) div {_TC_BUCKETS - 1}").cast("long").alias("emd_e6"),
        (
            F.expr(f"sum(d) div {_TC_BUCKETS - 1}") > _TC_T_E6
        )
        .cast("long")
        .alias("t_flag"),
    )


_LCC_TAIL_SQL = """
    tri AS (
      SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
      FROM {e0} e1
      JOIN {e0} e2 ON e1.v = e2.u
      JOIN {e0} e3 ON e3.u = e1.u AND e3.v = e2.v),
    pt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT ta AS node FROM tri
        UNION ALL SELECT tb FROM tri
        UNION ALL SELECT tc FROM tri)
      GROUP BY 1),
    dg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
           FROM {ed} GROUP BY 1)
    SELECT dg.node AS cust, dg.degree,
           CAST(coalesce(pt.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(2 * coalesce(pt.n_triangles, 0) * 1000000
                // (dg.degree * (dg.degree - 1)) AS BIGINT) AS lcc_e6
    FROM dg LEFT JOIN pt ON pt.node = dg.node
    WHERE dg.degree >= 2
    """


def _lcc_oracle_staged() -> list[str]:
    """Materialize the blocked projection once: the chained form
    re-inlines cp/e0 (a DISTINCT over the orders⋈lineitem join) per
    reference — five recomputations that spilled DuckDB out of disk
    at the 100× replica (the staged mode exists for exactly this,
    SCALE.md §9j)."""
    return [
        f"CREATE OR REPLACE TEMP TABLE lcc_e0 AS WITH {_LPA_EDGES_SQL} "
        "SELECT u, v FROM e0",
        "CREATE OR REPLACE TEMP TABLE lcc_ed AS "
        "SELECT u, v FROM lcc_e0 UNION ALL SELECT v, u FROM lcc_e0",
        "WITH "
        + _LCC_TAIL_SQL.format(e0="lcc_e0", ed="lcc_ed").lstrip(),
    ]


@query(
    "local_clustering_coeff",
    oracle=f"""
    WITH {_LPA_EDGES_SQL},
    {_LCC_TAIL_SQL.format(e0="e0", ed="ed").lstrip()}""",
    staged_oracle=_lcc_oracle_staged(),
)
def local_clustering_coeff(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node local clustering coefficient on the rare-part
    co-purchase graph: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) in
    1e-6 ticks — how close each customer's neighborhood is to a
    clique, the standard local-structure companion of the global
    triangle count.  Edges and triangle enumeration reuse the SHARED
    blocked projection (analytics2.copurchase_edges and the oriented
    a<b<c wedge join of triangle_count_copurchase — one audited
    candidate generator, not a re-derivation); nodes with degree >= 2
    and no triangles appear with lcc 0 via the left join.

    Scale: the projection is degree-bounded per rare part; the wedge
    join shuffles only the (persisted) edge list; degrees come from
    one groupBy over the symmetric edges.  Everything downstream of
    the projection is edge-cardinality, not corpus-cardinality."""
    ed = copurchase_edges(spark, sf)
    e0 = ed.filter(F.col("u") < F.col("v"))
    e1, e2, e3 = e0.alias("e1"), e0.alias("e2"), e0.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("ta"),
            F.col("e1.v").alias("tb"),
            F.col("e2.v").alias("tc"),
        )
    )
    pt = (
        tri.select(F.explode(F.array("ta", "tb", "tc")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    dg = ed.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return (
        dg.filter(F.col("degree") >= 2)
        .join(pt, "node", "left")
        .select(
            F.col("node").alias("cust"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.expr(
                "2 * coalesce(n_triangles, 0) * 1000000"
                " div (degree * (degree - 1))"
            )
            .cast("long")
            .alias("lcc_e6"),
        )
    )


# --- SAX symbolization: weekly PAA means of daily order revenue,
# mapped to a 4-letter alphabet at the exact nearest-rank quartiles.
_SAX_ALPHA = 4


@query(
    "sax_weekly_revenue",
    oracle="""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate)
                  AS BIGINT) AS ed,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS day_c
      FROM orders GROUP BY 1),
    w AS (
      SELECT ed // 7 AS wk, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(day_c) AS BIGINT) AS s
      FROM d GROUP BY 1),
    p AS (SELECT wk, n_days, s // n_days AS paa_c FROM w),
    r AS (
      SELECT wk, n_days, paa_c,
             row_number() OVER (ORDER BY paa_c, wk) AS rn,
             count(*) OVER () AS n
      FROM p),
    bp AS (
      SELECT min(CASE WHEN rn = (n + 3) // 4 THEN paa_c END) AS q1,
             min(CASE WHEN rn = (2 * n + 3) // 4 THEN paa_c END) AS q2,
             min(CASE WHEN rn = (3 * n + 3) // 4 THEN paa_c END) AS q3
      FROM r)
    SELECT r.wk, r.n_days, r.paa_c,
           CAST(CASE WHEN r.paa_c > bp.q3 THEN 3
                     WHEN r.paa_c > bp.q2 THEN 2
                     WHEN r.paa_c > bp.q1 THEN 1
                     ELSE 0 END AS BIGINT) AS symbol
    FROM r CROSS JOIN bp
    """,
)
def sax_weekly_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """SAX-style time-series symbolization (Lin, Keogh et al. 2003)
    of the order-revenue series: daily revenue → weekly PAA means
    (epoch-week buckets anchored at 1970-01-01, so no data-dependent
    origin) → a 4-letter alphabet cut at the exact nearest-rank
    quartiles of the PAA values (not the Gaussian breakpoints of the
    paper — quartiles are exactly computable in integers and make the
    symbols equi-frequent by construction).  The discretized series
    a similarity search / motif index stores instead of raw points.

    Scale: one orders scan → per-day aggregate (bounded by the date
    domain) → per-week aggregate; the rank window and the 1-row
    breakpoint panel run over the WEEK table (≤ a few thousand rows
    at any corpus size — calendar-bounded); the panel joins back as a
    scalar broadcast.  PAA means are integer cents div days."""
    d = (
        t(spark, sf, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("ed")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("day_c")
        )
    )
    w = d.groupBy(F.expr("ed div 7").alias("wk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("day_c").cast("long").alias("s"),
    )
    p = w.select("wk", "n_days", F.expr("s div n_days").alias("paa_c"))
    r = p.select(
        "wk",
        "n_days",
        "paa_c",
        F.row_number().over(W.orderBy("paa_c", "wk")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    bp = r.agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("paa_c"))
        ).alias("q1"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(2 * n + 3) div 4"), F.col("paa_c")
            )
        ).alias("q2"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("paa_c")
            )
        ).alias("q3"),
    )
    return r.crossJoin(F.broadcast(bp)).select(
        "wk",
        "n_days",
        "paa_c",
        F.when(F.col("paa_c") > F.col("q3"), 3)
        .when(F.col("paa_c") > F.col("q2"), 2)
        .when(F.col("paa_c") > F.col("q1"), 1)
        .otherwise(0)
        .cast("long")
        .alias("symbol"),
    )


# --- Poisson bootstrap: deterministic md5-u32 uniforms -> Poisson(1)
# weights via the inverse CDF, thresholds precomputed as exact int
# literals scaled to 2^32 (the u32 domain).
_BOOT_R = 32
_BOOT_CDF = []
_acc = 0.0
for _k in range(6):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _BOOT_CDF.append(int(math.floor(_acc * 4294967296.0)))


def _boot_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {thr} THEN {k}" for k, thr in enumerate(_BOOT_CDF)
    )
    return f"CASE {cases} ELSE 6 END"


@query(
    "bootstrap_revenue_ci",
    oracle=f"""
    WITH f AS (
      SELECT r.range AS rep,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             {_boot_w_sql(_md5_u32_sql("boot", "(o_orderkey * 32 + r.range)"))}
               AS w
      FROM orders CROSS JOIN range(0, {_BOOT_R}) r),
    reps AS (
      SELECT rep, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS total_c,
             CAST(sum(w * cents) AS BIGINT) AS boot_c
      FROM f GROUP BY 1),
    rk AS (
      SELECT *, row_number() OVER (ORDER BY boot_c, rep) AS rn FROM reps)
    SELECT CAST(min(n_orders) AS BIGINT) AS n_orders,
           CAST(min(total_c) AS BIGINT) AS total_c,
           CAST(min(boot_c) AS BIGINT) AS boot_min_c,
           CAST(min(CASE WHEN rn = {_BOOT_R // 2} THEN boot_c END)
                AS BIGINT) AS boot_med_c,
           CAST(max(boot_c) AS BIGINT) AS boot_max_c
    FROM rk
    """,
)
def bootstrap_revenue_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson bootstrap of total order revenue (the map-reduce
    bootstrap: each replicate reweights every row by an independent
    Poisson(1) draw, avoiding any resample-by-index shuffle — the
    formulation streaming/MapReduce systems use because it needs ONE
    pass).  Draws are deterministic: the md5-u32 portable uniform of
    (orderkey, replicate) against exact integer CDF thresholds
    (floor(cdf·2^32) literals), so both engines draw identical
    weights and the replicate envelope is oracle-checkable.  Output:
    exact total, replicate min / lower-median / max over R=32 — the
    spread a dashboard prints as the resampling uncertainty band.

    Scale: the ×R fan-out is map-side (no shuffle grows with R
    beyond the R-key aggregate); per-replicate partial sums combine
    map-side, so shuffle traffic is R rows per task; the rank window
    runs over the R-row replicate table.  Int64: Σ 6·cents ≈ 4e13 at
    the 100× replica — 5 orders inside int64."""
    w_col = F.lit(6)
    u = _md5_u32(
        "boot", F.col("o_orderkey") * _BOOT_R + F.col("rep")
    )
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w_col = F.when(u < _BOOT_CDF[k], k).otherwise(w_col)
    f = (
        t(spark, sf, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        )
        .withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
        )
        .select("rep", "cents", w_col.cast("long").alias("w"))
    )
    reps = f.groupBy("rep").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_c"),
        F.sum(F.col("w") * F.col("cents")).cast("long").alias("boot_c"),
    )
    rk = reps.withColumn(
        "rn", F.row_number().over(W.orderBy("boot_c", "rep"))
    )
    return rk.agg(
        F.min("n_orders").cast("long").alias("n_orders"),
        F.min("total_c").cast("long").alias("total_c"),
        F.min("boot_c").cast("long").alias("boot_min_c"),
        F.min(F.when(F.col("rn") == _BOOT_R // 2, F.col("boot_c")))
        .cast("long")
        .alias("boot_med_c"),
        F.max("boot_c").cast("long").alias("boot_max_c"),
    )


# --- permutation test: P deterministic pseudo-permutations of the
# treatment labels; permutation 0 IS the real labeling, so the
# observed statistic and the null draws come from one aggregate.
_PERM_P = 64


@query(
    "permutation_test_spend",
    oracle=f"""
    WITH pu AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM {EVENTS_US} events WHERE event_type = 'purchase'
      GROUP BY 1),
    lab AS (
      SELECT p.range AS perm, pu.y,
             CASE WHEN p.range = 0 THEN pu.user_id % 2
                  ELSE {_md5_u32_sql("perm", "(pu.user_id * 65 + p.range)")}
                       % 2 END AS g
      FROM pu CROSS JOIN range(0, {_PERM_P + 1}) p),
    st AS (
      SELECT perm,
             CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM lab GROUP BY 1),
    md AS (
      SELECT perm,
             abs(CASE WHEN n1 = 0 OR n0 = 0 THEN 0
                      ELSE (s1 * 10000) // n1 - (s0 * 10000) // n0 END)
               AS stat_e4,
             n1 + n0 AS n_users
      FROM st)
    SELECT CAST(min(n_users) AS BIGINT) AS n_users,
           CAST(min(CASE WHEN perm = 0 THEN stat_e4 END) AS BIGINT)
             AS obs_diff_e4,
           CAST(sum(CASE WHEN perm > 0 AND stat_e4 >=
                  (SELECT stat_e4 FROM md WHERE perm = 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           CAST((1 + sum(CASE WHEN perm > 0 AND stat_e4 >=
                  (SELECT stat_e4 FROM md WHERE perm = 0)
                THEN 1 ELSE 0 END)) * 1000000 // {_PERM_P + 1} AS BIGINT)
             AS p_value_e6
    FROM md
    """,
)
def permutation_test_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Permutation test for the even/odd-user spend difference: P=64
    deterministic pseudo-permutations relabel each user by the md5-u32
    parity of (user, permutation) — permutation 0 is the REAL
    labeling, so observed and null statistics come from one grouped
    aggregate.  The statistic is the tick-quantized absolute
    mean-difference |Σy₁·1e4 // n₁ − Σy₀·1e4 // n₀| (defined
    identically in both engines); the p-value is the standard
    add-one-smoothed (1 + #{null ≥ obs}) / (P + 1) in 1e-6 ticks.
    The resampling complement of bootstrap_revenue_ci: that one
    bounds an estimate, this one tests a hypothesis — both on
    portable-hash draws, which is what makes either oracle-checkable.

    Scale: per-user totals first (one events scan), THEN the ×(P+1)
    fan-out on the user table — resampling cost scales with users,
    not events; the P+1-row statistic table finishes driver-light.
    Int64: Σy·1e4 ≈ 2e15 at the 100× replica."""
    pu = (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    lab = pu.withColumn(
        "perm", F.explode(F.sequence(F.lit(0), F.lit(_PERM_P)))
    ).select(
        "perm",
        "y",
        F.when(F.col("perm") == 0, F.col("user_id") % 2)
        .otherwise(
            _md5_u32(
                "perm", F.col("user_id") * (_PERM_P + 1) + F.col("perm")
            )
            % 2
        )
        .alias("g"),
    )
    st = lab.groupBy("perm").agg(
        F.sum(F.when(F.col("g") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("g") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
    )
    md = st.select(
        "perm",
        F.abs(
            F.when((F.col("n1") == 0) | (F.col("n0") == 0), F.lit(0))
            .otherwise(
                F.expr("(s1 * 10000) div n1 - (s0 * 10000) div n0")
            )
        ).alias("stat_e4"),
        (F.col("n1") + F.col("n0")).alias("n_users"),
    )
    obs = md.filter(F.col("perm") == 0).select(
        F.col("stat_e4").alias("obs_e4")
    )
    j = md.crossJoin(F.broadcast(obs))
    return j.agg(
        F.min("n_users").cast("long").alias("n_users"),
        F.min(F.when(F.col("perm") == 0, F.col("stat_e4")))
        .cast("long")
        .alias("obs_diff_e4"),
        F.sum(
            F.when(
                (F.col("perm") > 0)
                & (F.col("stat_e4") >= F.col("obs_e4")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_ge"),
        F.expr(
            "CAST((1 + sum(CASE WHEN perm > 0 AND stat_e4 >= obs_e4"
            f" THEN 1 ELSE 0 END)) * 1000000 div {_PERM_P + 1} AS BIGINT)"
        ).alias("p_value_e6"),
    )
