"""Skew mitigation: explicit key salting (SURVEY.md §7.6 scale notes).

The reference's ``len(word) % R`` partitioner (mapper_word_count.py:28)
is the canonical skew generator — English word lengths cluster at 2-8,
so a few reducers get nearly all pairs.  At 100 TB the same pathology
appears on any hot join/group key.  AQE's skew-join splitting handles
the sort-merge case at runtime; these helpers are the explicit,
planner-independent treatment for when AQE can't (first-stage
aggregation into ``collect_list``-style holistic aggs, broadcast-able
hot dimensions that are still too big to broadcast whole).

``salted_join``  : N-way replicate the small side, salt the big side
                   deterministically, join on (key, salt) — each hot
                   key's rows spread over N tasks.
``salted_count`` : two-stage count aggregation — stage 1 groups on
                   (key, salt) so no single task sees a whole hot key,
                   stage 2 merges the N partials per key.
Both are output-identical to their unsalted forms (oracle-checked by
``skew_salted_join_counts``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the whole
    row (identical rows share a salt — irrelevant for load spreading,
    and it keeps the expression free of nondeterminism so retries and
    oracle hashes stay stable)."""
    return F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``: the small side is
    replicated n_salts times (explode of a literal range — its size
    grows n_salts x, so keep it dimension-sized), the big side gets a
    deterministic row salt, and the join key becomes (on, salt)."""
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    salted_big = big.withColumn("__salt", _row_salt(big, n_salts))
    return salted_big.join(replicated, [on, "__salt"], how).drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """count(*) per key in two stages so no single reduce task
    materializes a whole hot key's group.  (Spark's hash aggregate
    already does map-side partials for algebraic aggs; the explicit
    form is the template for holistic aggs — collect_list, exact
    percentile — where partials don't exist.)"""
    partial = (
        df.withColumn("__salt", _row_salt(df, n_salts))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))
