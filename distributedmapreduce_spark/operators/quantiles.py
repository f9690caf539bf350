"""Equal-frequency bucket assignment without a global rank window
(the VERDICT r05 #1 discipline, made reusable).

``equal_freq_bucket`` assigns each row its 1..n_buckets equal-depth
bucket in the total order (value, tiebreak) — the semantics of
``1 + ((row_number() - 1) * n) div count(*)`` — while never ranking
the full table through one task:

1. rows are binned by ``floor(value / bucket_width)`` (sign-flipped
   for descending order), so bin count is bounded by the VALUE RANGE
   over the width — independent of row count;
2. per-bin totals (a map-side-combinable aggregate) feed a window over
   the tiny bin table only, yielding each bin's exclusive rank base
   and the grand total n;
3. the n_buckets-1 interior boundary ranks ceil(d*n/n_buckets) land in
   at most n_buckets-1 "boundary bins"; a per-bin window runs ONLY
   over those bins' rows to extract the boundary TUPLES;
4. assignment is a map-only broadcast-array compare: a row's bucket is
   1 + (number of boundary tuples strictly ahead of it), counted with
   multiplicity (two boundary ranks can coincide when n < n_buckets).

Identity: rank rn's bucket is 1 + #{d : rn > ceil(d*n/n_buckets)},
so comparing against the boundary tuples reproduces the rank formula
exactly — hash-verified against global-window DuckDB oracles by
``decile_lift_gains`` and ``rfm_user_segments``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def equal_freq_bucket(
    df: DataFrame,
    value: str,
    tiebreak: str,
    out: str,
    n_buckets: int,
    bucket_width: int = 4096,
    descending: bool = False,
) -> DataFrame:
    """Add column ``out`` = equal-frequency bucket (1..n_buckets) of
    each row in the total order (value <asc|desc>, tiebreak asc).
    ``value`` must be an integral column; ``tiebreak`` must make the
    order total.  All input columns pass through."""
    v = F.col(value)
    bkt = F.floor((-v if descending else v) / bucket_width).cast("long")
    pb = df.withColumn("__efb_bkt", bkt)
    btot = pb.groupBy("__efb_bkt").agg(
        F.count(F.lit(1)).cast("long").alias("__efb_cnt")
    )
    wb = W.orderBy("__efb_bkt").rowsBetween(W.unboundedPreceding, -1)
    bbase = btot.select(
        "__efb_bkt",
        F.coalesce(F.sum("__efb_cnt").over(wb), F.lit(0))
        .cast("long")
        .alias("__efb_base"),
        "__efb_cnt",
        F.sum("__efb_cnt")
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("__efb_n"),
    )
    targets = (
        bbase.select(
            "__efb_bkt",
            "__efb_base",
            F.explode(
                F.array(*[F.lit(d) for d in range(1, n_buckets)])
            ).alias("__efb_d"),
            F.expr(
                f"(__efb_d * __efb_n + {n_buckets - 1}) div {n_buckets}"
            ).alias("__efb_brank"),
        )
        .filter(
            (F.col("__efb_base") < F.col("__efb_brank"))
            & (
                F.col("__efb_brank")
                <= F.col("__efb_base") + F.col("__efb_cnt")
            )
        )
        .groupBy("__efb_bkt", "__efb_base", "__efb_brank")
        .agg(F.count(F.lit(1)).cast("long").alias("__efb_mult"))
    )
    order = [v.desc() if descending else v.asc(), F.col(tiebreak).asc()]
    wl = W.partitionBy("__efb_bkt", "__efb_brank").orderBy(*order)
    bounds = (
        pb.join(F.broadcast(targets), "__efb_bkt")
        .withColumn("__efb_rn", F.col("__efb_base") + F.row_number().over(wl))
        .filter(F.col("__efb_rn") == F.col("__efb_brank"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col(value).alias("bv"),
                    F.col(tiebreak).alias("bt"),
                    F.col("__efb_mult").alias("mult"),
                )
            ).alias("__efb_bs")
        )
    )
    ahead = F.aggregate(
        F.filter(F.col("__efb_bs"), _ahead_pred(value, tiebreak, descending)),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b["mult"],
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, (ahead + 1).cast("long"))
        .drop("__efb_bs")
    )


def _ahead_pred(value: str, tiebreak: str, descending: bool):
    def pred(b: Column) -> Column:
        if descending:
            first = b["bv"] > F.col(value)
        else:
            first = b["bv"] < F.col(value)
        return first | (
            (b["bv"] == F.col(value)) & (b["bt"] < F.col(tiebreak))
        )

    return pred
