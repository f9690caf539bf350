"""Query registry infrastructure.

Every operator from SURVEY.md §2 is registered as a named query:
a (SparkSession, sf_dir) -> DataFrame callable, plus (where the
semantics are SQL-expressible) an equivalent DuckDB SQL string used
as the correctness oracle.  Column names/aliases MUST match between
the Spark result and the oracle — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query (and optional DuckDB oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(fn, oracle)
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used by the query definitions."""
    return load_table(spark, name, sf_dir)
