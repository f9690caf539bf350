"""Reusable vector column expressions over array<float|double>
embeddings — dot/norm/cosine via higher-order functions, computed in
double precision (matches a DuckDB DOUBLE[] oracle bit-for-bit on the
same input floats)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
