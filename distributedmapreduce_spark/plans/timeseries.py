"""Round-5 timeseries battery: OHLC resampling, time-weighted
averages, and interval-overlap joins — the hypertable/market-data
operator family (TimescaleDB's time_bucket/TWA/range-join surface)
re-expressed Spark-first.

Portability discipline as plans/analytics.py: µs-pinned event
timestamps (EVENTS_US), exact BIGINT cents, total ordering by
(ts, event_id) everywhere a window or first/last selection occurs,
and integer quotient+remainder decomposition instead of double
division wherever a ratio ships in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .core import EVENTS_US, query, t

_HOUR_US = 3_600_000_000
_DUR_MOD_S = 3540  # interval length = cents % 3540 + 60 -> [60, 3599] s


@query(
    "ohlc_resample",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} events),
    b AS (
      SELECT event_type, us // {_HOUR_US} AS hour_bucket, us, event_id,
             cents
      FROM e),
    o AS (
      SELECT event_type, hour_bucket, cents,
             row_number() OVER (PARTITION BY event_type, hour_bucket
                                ORDER BY us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, hour_bucket
                                ORDER BY us DESC, event_id DESC) AS rn_z
      FROM b)
    SELECT event_type, hour_bucket,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
             AS open_c,
           CAST(max(cents) AS BIGINT) AS high_c,
           CAST(min(cents) AS BIGINT) AS low_c,
           CAST(max(CASE WHEN rn_z = 1 THEN cents END) AS BIGINT)
             AS close_c,
           CAST(count(*) AS BIGINT) AS n
    FROM o GROUP BY 1, 2
    """,
)
def ohlc_resample(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) candles per event type — the
    canonical market-data downsample.  Open/close are FIRST/LAST by
    the total order (us, event_id), selected via dual row_numbers +
    conditional aggregation (engine-portable, unlike any_value or
    first() which are order-undefined), on exact cents.  Scale: one
    corpus scan; every window partitions on (type, hour bucket) so
    state is bounded by a bucket's rows; the aggregate is map-side
    combinable.  This is the hypertable continuous-aggregate shape —
    at 100 TB the candles table is (types × hours), metadata-sized,
    and refreshes incrementally per arriving bucket
    (mv_incremental_refresh is the companion maintenance op)."""
    e = t(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("hour_bucket", F.expr(f"us div {_HOUR_US}"))
    wp = W.partitionBy("event_type", "hour_bucket")
    o = e.select(
        "event_type",
        "hour_bucket",
        "cents",
        F.row_number().over(wp.orderBy("us", "event_id")).alias("rn_a"),
        F.row_number()
        .over(wp.orderBy(F.col("us").desc(), F.col("event_id").desc()))
        .alias("rn_z"),
    )
    return o.groupBy("event_type", "hour_bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents")))
        .cast("long")
        .alias("open_c"),
        F.max("cents").cast("long").alias("high_c"),
        F.min("cents").cast("long").alias("low_c"),
        F.max(F.when(F.col("rn_z") == 1, F.col("cents")))
        .cast("long")
        .alias("close_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "time_weighted_average",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} events),
    d AS (
      SELECT event_type, cents,
             lead(us) OVER (PARTITION BY event_type
                            ORDER BY us, event_id) - us AS dur
      FROM e),
    s AS (
      SELECT event_type,
             CAST(sum(cents * dur) AS BIGINT) AS scd,
             CAST(sum(dur) AS BIGINT) AS sd,
             CAST(count(*) AS BIGINT) AS n_holds
      FROM d WHERE dur IS NOT NULL AND dur > 0 GROUP BY 1)
    SELECT event_type, sd AS sum_dur_us, n_holds,
           scd // sd AS twap_cents,
           ((scd % sd) * 1000000) // sd AS twap_frac_e6
    FROM s
    """,
)
def time_weighted_average(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average value per event type (TimescaleDB's
    time_weight, last-observation-carried-forward): each observation
    holds its cents value until the next observation, and the TWA is
    Σ(cents·hold_µs)/Σ(hold_µs) — shipped as an EXACT integer
    quotient + remainder expansion (twap_cents, twap_frac_e6): the
    naive ·1e6-then-divide would overflow int64, and a double divide
    would be engine-ambient; q/r decomposition is exact at any scale.
    Int64 headroom is TIME-bounded, not row-bounded: Σ(cents·dur) ≤
    max_cents · observation_span regardless of row count (~1.3e17 for
    a 30-day window — 70× under the edge even at 100 TB density).
    A hold is a STRICTLY POSITIVE duration: same-instant repeats
    contribute nothing, and a type whose observations all share one
    instant has no time-weighted average — it is absent from the
    output instead of emitting a 0/0 NULL row (hypothesis brute-force
    find: the dur-IS-NOT-NULL-only form divided by zero there,
    NULL-rowing on DuckDB and raising under ANSI Spark).
    Scale (r06 — the segmented-sweep swap the old docstring promised,
    applied): the lead() runs per (type, HOUR) partition, never over a
    type's whole stream; each bucket's last observation is stitched to
    the next non-empty bucket's first via a lead over the per-bucket
    summary table (time-bounded cardinality: types x hours), whose
    first/last tuples come from lexicographic struct min/max — so a
    type too hot for one partition costs hour-bounded window state."""
    e = t(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("hb", F.expr(f"us div {_HOUR_US}"))
    wl = W.partitionBy("event_type", "hb").orderBy("us", "event_id")
    inner = e.select(
        "event_type",
        "cents",
        (F.lead("us").over(wl) - F.col("us")).alias("dur"),
    )
    # bucket summary: first (us,id) and last (us,id,cents) per bucket —
    # (us,event_id) is unique, so the lexicographic max never lets
    # cents decide the winner
    bk = e.groupBy("event_type", "hb").agg(
        F.min(F.struct("us", "event_id")).alias("fst"),
        F.max(F.struct("us", "event_id", "cents")).alias("lst"),
    )
    wbk = W.partitionBy("event_type").orderBy("hb")
    stitch = bk.select(
        "event_type",
        F.col("lst.cents").alias("cents"),
        (
            F.lead(F.col("fst.us")).over(wbk) - F.col("lst.us")
        ).alias("dur"),
    )
    d = inner.unionByName(stitch).filter(
        F.col("dur").isNotNull() & (F.col("dur") > 0)
    )
    s = d.groupBy("event_type").agg(
        F.sum(F.col("cents") * F.col("dur")).cast("long").alias("scd"),
        F.sum("dur").cast("long").alias("sd"),
        F.count(F.lit(1)).cast("long").alias("n_holds"),
    )
    return s.select(
        "event_type",
        F.col("sd").alias("sum_dur_us"),
        "n_holds",
        F.expr("scd div sd").alias("twap_cents"),
        F.expr("((scd % sd) * 1000000) div sd").alias("twap_frac_e6"),
    )


@query(
    "interval_overlap_join",
    oracle=f"""
    WITH iv AS (
      SELECT event_type, event_id, user_id, epoch_us(ts) AS s,
             epoch_us(ts)
               + ((CAST(round(value * 100) AS BIGINT) % {_DUR_MOD_S}) + 60)
                 * 1000000 AS e
      FROM {EVENTS_US} events
      WHERE event_type IN ('click', 'view')),
    a AS (SELECT user_id, event_id AS click_id, s, e FROM iv
          WHERE event_type = 'click'),
    b AS (SELECT user_id, event_id AS view_id, s, e FROM iv
          WHERE event_type = 'view')
    SELECT a.user_id, a.click_id, b.view_id,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM a JOIN b
      ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
    """,
)
def interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-OVERLAP join (two interval sets, all pairs that
    intersect in time, same user) — the third member of the temporal
    join family next to range_join (point-in-window) and as-of
    (nearest predecessor).  The oracle is the declarative theta join;
    the Spark plan is CARTESIAN-FREE: every interval (< 1 h long by
    construction) explodes to the 1-hour grid cells it covers (≤ 2),
    candidates come from an equi-join on (user, cell), the exact
    predicate filters, and a distinct collapses the ≤ 2-cell double
    matches.  Scale: candidate volume is Σ per-(user, cell)
    |clicks|·|views| — density-bounded, never all-pairs; the cell
    width should track the max interval length (wider intervals →
    coarser grid or interval splitting, same as range_join's
    bucket-width rule)."""
    iv = (
        t(spark, sf, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("s"),
            (
                F.unix_micros("ts")
                + (
                    (F.round(F.col("value") * 100).cast("long") % _DUR_MOD_S)
                    + 60
                )
                * F.lit(1_000_000)
            ).alias("e"),
        )
        .withColumn(
            "cell",
            F.explode(
                F.sequence(
                    F.expr(f"s div {_HOUR_US}"),
                    F.expr(f"(e - 1) div {_HOUR_US}"),
                )
            ),
        )
    )
    a = iv.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("s").alias("as_"), F.col("e").alias("ae"), "cell",
    )
    b = iv.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("view_id"),
        F.col("s").alias("bs"), F.col("e").alias("be"),
        F.col("cell").alias("b_cell"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("cell") == F.col("b_cell")),
        )
        .filter((F.col("as_") < F.col("be")) & (F.col("bs") < F.col("ae")))
        .select(
            "user_id",
            "click_id",
            "view_id",
            (
                F.least("ae", "be") - F.greatest("as_", "bs")
            ).alias("overlap_us"),
        )
        .distinct()
    )


@query(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hb,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} events),
    h AS (
      SELECT event_type, hb, CAST(sum(cents) AS BIGINT) AS tot
      FROM e GROUP BY 1, 2),
    j AS (
      SELECT cur.event_type, cur.tot AS actual, prev.tot AS forecast
      FROM h cur JOIN h prev
        ON cur.event_type = prev.event_type AND cur.hb = prev.hb + 24)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err_c,
           CAST(sum(abs(actual - forecast)) AS BIGINT) // count(*)
             AS mae_c
    FROM j GROUP BY 1
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ(t) = y(t - 24 h))
    on hourly revenue per event type: MAE in exact cents over every
    hour that has a same-hour-yesterday counterpart.  The
    seasonal-naive is THE baseline every real forecaster must beat
    (M-competition practice), and this query is the evaluation-harness
    shape: aggregate once, self-join on the shifted bucket key, exact
    integer error sums.  Missing buckets (silent hours) simply produce
    no pair — compose with time_bucket_gapfill for the
    zero-filled-regime backtest.  Scale: one corpus scan reduces to
    the (type × hour) grid; the shifted self-join runs on that
    metadata-sized grid, never on events."""
    h = (
        t(spark, sf, "events")
        .select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hb"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "hb")
        .agg(F.sum("cents").cast("long").alias("tot"))
    )
    cur, prev = h.alias("cur"), h.alias("prev")
    j = cur.join(
        prev,
        (F.col("cur.event_type") == F.col("prev.event_type"))
        & (F.col("cur.hb") == F.col("prev.hb") + 24),
    ).select(
        F.col("cur.event_type").alias("event_type"),
        F.col("cur.tot").alias("actual"),
        F.col("prev.tot").alias("forecast"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        .cast("long")
        .alias("sum_abs_err_c"),
        F.expr("CAST(sum(abs(actual - forecast)) AS BIGINT) div count(*)")
        .alias("mae_c"),
    )


@query(
    "cusum_changepoint",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hb
      FROM {EVENTS_US} events),
    h AS (
      SELECT event_type, hb, CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
    st AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS nb
      FROM h GROUP BY 1),
    c AS (
      SELECT h.event_type, h.hb,
             sum(h.n * st.nb - st.tot)
               OVER (PARTITION BY h.event_type ORDER BY h.hb
                     ROWS UNBOUNDED PRECEDING) AS cus
      FROM h JOIN st ON h.event_type = st.event_type),
    m AS (
      SELECT event_type, hb, cus,
             max(abs(cus)) OVER (PARTITION BY event_type) AS mx
      FROM c)
    SELECT event_type, CAST(mx AS BIGINT) AS max_cusum_nb,
           min(hb) AS at_hour_bucket
    FROM m WHERE abs(cus) = mx GROUP BY 1, 2
    """,
)
def cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint location on hourly event counts per type
    (Page 1954): the running sum of deviations from the series mean
    peaks (in absolute value) at the most likely level-shift point.
    Kept EXACT by scaling: instead of n - tot/nb (a double mean), the
    running statistic is Σ(n·nb - tot) — the CUSUM multiplied by nb,
    an integer with identical argmax; its magnitude is bounded by
    tot·nb (~1e5·720 at sf0.1, ~1e9·720 at 100 TB-scale hourly
    grids — far inside int64 because the GRID, not the corpus, is the
    operand).  Ties on |cusum| resolve to the earliest hour.  Scale:
    one corpus scan reduces to the (type × hour) grid; windows run on
    the grid only."""
    h = (
        t(spark, sf, "events")
        .select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hb"),
        )
        .groupBy("event_type", "hb")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    st = h.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    wc = (
        W.partitionBy("event_type")
        .orderBy("hb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = (
        h.join(F.broadcast(st), "event_type")
        .select(
            "event_type",
            "hb",
            F.sum(F.col("n") * F.col("nb") - F.col("tot"))
            .over(wc)
            .alias("cus"),
        )
    )
    m = c.withColumn(
        "mx", F.max(F.abs(F.col("cus"))).over(W.partitionBy("event_type"))
    )
    return (
        m.filter(F.abs(F.col("cus")) == F.col("mx"))
        .groupBy("event_type", F.col("mx").cast("long").alias("max_cusum_nb"))
        .agg(F.min("hb").alias("at_hour_bucket"))
    )


_SESSION_GAP_US = 1_800_000_000  # 30 min
_PATH_MAX_STEPS = 8
_PATH_TOPK = 20


@query(
    "session_top_paths",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM {EVENTS_US} events),
    o AS (
      SELECT user_id, event_id, event_type, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (
      SELECT user_id, event_id, event_type, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
    r AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY us, event_id) AS rn
      FROM s),
    p AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_MAX_STEPS} GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY 1
    ORDER BY n DESC, path LIMIT {_PATH_TOPK}
    """,
)
def session_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 session paths: users' event streams split into sessions
    at 30-minute inactivity gaps (the sessionization rule, re-derived
    here by gaps-and-islands so the query is self-contained), each
    session reduced to its first 8 event types joined as a 'a>b>c'
    path, ranked by frequency — the product-analytics "what do users
    actually do" query.  The 8-step cap bounds both the path string
    and the per-session state; ranking ties break on the path string,
    so the top-k is deterministic.  Path assembly is
    array_sort(collect_list(struct(rn, type))) — order carried IN the
    data, portable against DuckDB's ordered string_agg.  Scale: one
    user-keyed shuffle for the session windows (per-user state is one
    lag), one path-keyed aggregate; the top-k runs on the path
    cardinality."""
    e = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    wu = W.partitionBy("user_id").orderBy("us", "event_id")
    o = e.withColumn(
        "brk",
        F.when(
            F.lag("us").over(wu).isNull()
            | ((F.col("us") - F.lag("us").over(wu)) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    s = o.withColumn(
        "sid",
        F.sum("brk").over(wu.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    r = s.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id", "sid").orderBy("us", "event_id")
        ),
    ).filter(F.col("rn") <= _PATH_MAX_STEPS)
    p = r.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(_PATH_TOPK)
    )


_NEAREST_TOL_US = 3_600_000_000  # ±1 h


@query(
    "asof_join_nearest",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pts
      FROM {EVENTS_US} events WHERE event_type = 'purchase'),
    c AS (
      SELECT event_id AS cid, user_id, epoch_us(ts) AS cts
      FROM {EVENTS_US} events WHERE event_type = 'click'),
    cand AS (
      SELECT p.pid, c.cid, abs(c.cts - p.pts) AS dist,
             CASE WHEN c.cts <= p.pts THEN 0 ELSE 1 END AS after_flag
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.cts BETWEEN p.pts - {_NEAREST_TOL_US}
                     AND p.pts + {_NEAREST_TOL_US}),
    r AS (
      SELECT pid, cid, dist,
             row_number() OVER (PARTITION BY pid
                                ORDER BY dist, after_flag, cid) AS rn
      FROM cand)
    SELECT pid, cid AS nearest_click_id, dist AS dist_us
    FROM r WHERE rn = 1
    """,
)
def asof_join_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """NEAREST-in-time as-of join (pandas merge_asof
    direction='nearest'): each purchase matched to the click with the
    smallest |Δt| within ±1 h, ties resolved to the EARLIER side then
    the smaller id — completing the temporal-join family (backward
    as-of, forward+tolerance, range, interval-overlap, and now
    nearest).  Scale: candidates come from a (user, time)-bounded
    equi-join — the tolerance bounds each purchase's candidate set —
    and the per-purchase argmin window partitions on purchase id; for
    mega-users the (user, hour-bucket) scheme of range_join_event_
    pairs drops in.  The BETWEEN predicate pushes into the join,
    never a cartesian (explain-lint-gated like every query)."""
    ev = t(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuser"),
        F.unix_micros("ts").alias("cts"),
    )
    cand = p.join(
        c,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("cts") >= F.col("pts") - _NEAREST_TOL_US)
        & (F.col("cts") <= F.col("pts") + _NEAREST_TOL_US),
    ).select(
        "pid",
        "cid",
        F.abs(F.col("cts") - F.col("pts")).alias("dist"),
        F.when(F.col("cts") <= F.col("pts"), 0).otherwise(1).alias("after_flag"),
    )
    r = cand.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("pid").orderBy("dist", "after_flag", "cid")
        ),
    )
    return r.filter(F.col("rn") == 1).select(
        "pid",
        F.col("cid").alias("nearest_click_id"),
        F.col("dist").alias("dist_us"),
    )


_EWMA_W = [128, 64, 32, 16, 8, 4, 2, 1]  # 2^(7-a) for age a = 0..7
_DAY_US = 86_400_000_000


@query(
    "ewma_pow2_user_spend",
    oracle=f"""
    WITH b AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM {EVENTS_US} events WHERE event_type = 'purchase'
      GROUP BY 1, 2),
    w AS (SELECT * FROM (VALUES {", ".join(f"({a}, {w})" for a, w in
                                           enumerate(_EWMA_W))})
          AS t(a, wt)),
    c AS (
      SELECT b.user_id, b.day + w.a AS day, sum(b.cents * w.wt) AS e,
             max(CASE WHEN w.a = 0 THEN 1 ELSE 0 END) AS hb
      FROM b CROSS JOIN w GROUP BY 1, 2)
    SELECT user_id, CAST(day AS BIGINT) AS day,
           CAST(e AS BIGINT) AS ewma_c
    FROM c WHERE hb = 1
    """,
)
def ewma_pow2_user_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing exponentially-weighted spend per user per active day —
    the decayed-recency feature behind churn/LTV models — with
    power-of-2 integer weights so the statistic is EXACT: for each
    (user, day) with a purchase, ewma_c = Σ_{{a=0..7}}
    spend(day−a)·2^(7−a) in cents.  Instead of a variable-weight
    window (inexpressible as a plain frame sum), each day-bucket
    SCATTERS its 8 future contributions (posexplode of the weight
    vector), and one groupBy folds them — the a=0 contribution doubles
    as the "day is active" marker, so rows without spend are filtered
    by the same fold and the corpus is scanned exactly ONCE.  Headroom:
    Σweights = 255, so ewma_c ≤ 255 × the max single-day user spend —
    at the 100× replica ≈ 2·10¹⁰, five orders inside int64.

    Scale: the day-bucket aggregate shrinks the corpus to
    (user × active-day) before the 8× scatter, so shuffle volume is
    8 rows per user-day — a constant factor, not a window over raw
    events; everything is hash-partitioned on (user, day), no skew
    beyond a single user-day's events (the documented
    rolling_7d_user_spend caveat applies the same way)."""
    b = (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("cents")
        )
    )
    wts = F.array(*[F.lit(w) for w in _EWMA_W])
    c = (
        b.select(
            "user_id",
            "day",
            "cents",
            F.posexplode(wts).alias("a", "wt"),
        )
        .groupBy(
            "user_id", (F.col("day") + F.col("a")).alias("day")
        )
        .agg(
            F.sum(F.col("cents") * F.col("wt")).alias("e"),
            F.max(
                F.when(F.col("a") == 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("hb"),
        )
    )
    return c.filter(F.col("hb") == 1).select(
        "user_id",
        F.col("day").cast("long"),
        F.col("e").cast("long").alias("ewma_c"),
    )


@query(
    "seasonal_decompose_daily",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x_c
      FROM orders GROUP BY 1),
    ma AS (
      SELECT day, x_c,
             sum(x_c) OVER w AS s7, count(*) OVER w AS c7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                   AND 3 FOLLOWING)),
    tr AS (
      SELECT day, x_c,
             CASE WHEN c7 = 7 THEN (2 * s7 + 7) // 14 END AS trend_c,
             CAST(datediff('day', DATE '1970-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM ma),
    de AS (SELECT *, x_c - trend_c AS detr FROM tr),
    sea AS (
      SELECT dow,
             CASE WHEN sum(detr) < 0
                  THEN -((2 * (-sum(detr)) + count(detr))
                         // (2 * count(detr)))
                  ELSE (2 * sum(detr) + count(detr))
                       // (2 * count(detr)) END AS seas_c
      FROM de WHERE detr IS NOT NULL GROUP BY dow)
    SELECT de.day, CAST(de.x_c AS BIGINT) AS x_c,
           CAST(de.trend_c AS BIGINT) AS trend_c,
           CAST(sea.seas_c AS BIGINT) AS seas_c,
           CAST(de.detr - sea.seas_c AS BIGINT) AS resid_c
    FROM de JOIN sea ON de.dow = sea.dow
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily revenue
    series — x = trend + seasonal + residual — entirely in exact
    integer cents: trend is the centered 7-observation moving average
    (round-half-up, emitted only where the full window exists, NULL
    at the series edges), seasonal is the per-day-of-week
    round-half-away-from-zero mean of the detrended values (the sign
    split keeps every division's operands non-negative, so any
    division convention agrees), residual is what remains.  The
    companion to seasonal_naive_backtest (which forecasts) and
    acf_daily_revenue (which measures residual structure): this is
    the decomposition a forecasting pipeline inspects first.

    Scale: one orders scan to the day-keyed aggregate; the moving
    average is a bounded window over that tiny series; the seasonal
    table is 7 rows broadcast back.  NULL trend/residual rows at the
    edges are part of the contract (both engines emit them
    identically)."""
    de, sea = _daily_detrended(spark, sf)
    return de.join(F.broadcast(sea), "dow").select(
        "day",
        F.col("x_c").cast("long"),
        F.col("trend_c").cast("long"),
        F.col("seas_c").cast("long"),
        (F.col("detr") - F.col("seas_c")).cast("long").alias("resid_c"),
    )


def _daily_detrended(spark: SparkSession, sf: str):
    """(de, sea): the detrended daily revenue table (day, x_c,
    trend_c, dow, detr) and the per-day-of-week seasonal means —
    the shared core of seasonal_decompose_daily and
    forecast_conformal_intervals (one formulation, two reports)."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("x_c")
        )
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "x_c",
        F.sum("x_c").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    tr = ma.select(
        "day",
        "x_c",
        F.when(F.col("c7") == 7, F.expr("(2 * s7 + 7) div 14")).alias(
            "trend_c"
        ),
        (F.datediff(F.col("day"), F.lit("1970-01-01")) % 7)
        .cast("long")
        .alias("dow"),
    )
    de = tr.withColumn("detr", F.col("x_c") - F.col("trend_c"))
    sea = (
        de.filter(F.col("detr").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                "CASE WHEN sum(detr) < 0"
                " THEN -((2 * (-sum(detr)) + count(detr))"
                " div (2 * count(detr)))"
                " ELSE (2 * sum(detr) + count(detr))"
                " div (2 * count(detr)) END"
            ).alias("seas_c")
        )
    )
    return de, sea


@query(
    "forecast_conformal_intervals",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x_c
      FROM orders GROUP BY 1),
    ma AS (
      SELECT day, x_c,
             sum(x_c) OVER w AS s7, count(*) OVER w AS c7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                   AND 3 FOLLOWING)),
    tr AS (
      SELECT day, x_c,
             CASE WHEN c7 = 7 THEN (2 * s7 + 7) // 14 END AS trend_c,
             CAST(datediff('day', DATE '1970-01-01', day) % 7
                  AS BIGINT) AS dow
      FROM ma),
    de AS (SELECT *, x_c - trend_c AS detr FROM tr
           WHERE trend_c IS NOT NULL),
    sea AS (
      SELECT dow,
             CASE WHEN sum(detr) < 0
                  THEN -((2 * (-sum(detr)) + count(detr))
                         // (2 * count(detr)))
                  ELSE (2 * sum(detr) + count(detr))
                       // (2 * count(detr)) END AS seas_c
      FROM de GROUP BY dow),
    r AS (
      SELECT de.dow, de.day, sea.seas_c,
             abs(de.detr - sea.seas_c) AS absr
      FROM de JOIN sea ON de.dow = sea.dow),
    rk AS (
      SELECT dow, seas_c, absr,
             row_number() OVER (PARTITION BY dow
                                ORDER BY absr, day) AS rn,
             count(*) OVER (PARTITION BY dow) AS n_obs
      FROM r)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(seas_c AS BIGINT) AS seas_c,
           CAST(absr AS BIGINT) AS p90_abs_resid_c,
           CAST(seas_c - absr AS BIGINT) AS lo_c,
           CAST(seas_c + absr AS BIGINT) AS hi_c
    FROM rk WHERE rn = (9 * n_obs + 9) // 10
    """,
)
def forecast_conformal_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal-style forecast intervals per day-of-week: the
    exact 90th-percentile order statistic of |residual| around the
    seasonal component (k = ceil(0.9·n), selected by rank over the
    (|resid|, day) total order — no interpolation, so the answer is
    an observed integer), published as seasonal ± p90 bounds.  The
    decomposition core is the SAME `_daily_detrended` helper
    seasonal_decompose_daily uses, so the interval is calibrated on
    exactly the shipped residuals.

    Scale: everything after the day-keyed aggregate is bounded
    (days × 1 row); the rank window partitions the tiny day table by
    dow — its input subtree is the day aggregate, which is what the
    window-funnel lint structurally verifies."""
    de, sea = _daily_detrended(spark, sf)
    r = (
        de.filter(F.col("trend_c").isNotNull())
        .join(F.broadcast(sea), "dow")
        .select(
            "dow",
            "day",
            "seas_c",
            F.abs(F.col("detr") - F.col("seas_c")).alias("absr"),
        )
    )
    wp = W.partitionBy("dow")
    rk = r.select(
        "dow",
        "seas_c",
        "absr",
        F.row_number().over(wp.orderBy("absr", "day")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_obs"),
    )
    return rk.filter(
        F.col("rn") == F.expr("(9 * n_obs + 9) div 10")
    ).select(
        F.col("dow").cast("long"),
        F.col("n_obs").cast("long"),
        F.col("seas_c").cast("long"),
        F.col("absr").cast("long").alias("p90_abs_resid_c"),
        (F.col("seas_c") - F.col("absr")).cast("long").alias("lo_c"),
        (F.col("seas_c") + F.col("absr")).cast("long").alias("hi_c"),
    )
