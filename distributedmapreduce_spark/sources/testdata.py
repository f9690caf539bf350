"""Loaders for the driver-generated synthetic star schema + streams
(/root/testdata/sf*/ — see TESTDATA.md / FIXTURES.md §B).

Parquet is the engine's primary columnar source: Catalyst pushes
filters and column pruning into these scans (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS), which a
        # vanilla SparkSession refuses to read (PARQUET_TYPE_ILLEGAL).
        # nanosAsLong is runtime-settable, so enable it here instead of
        # relying on the repo's own session factory — the engine must
        # work under ANY caller-provided session (e.g. the driver's).
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), surfaced as nanos-since-epoch
        # long (spark.sql.legacy.parquet.nanosAsLong); truncate to
        # microseconds — the same truncation DuckDB applies reading
        # TIMESTAMP_NS into its microsecond TIMESTAMP.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div`, not `/`: double division loses µs precision
            # on ~1e18-ns epoch values (53-bit mantissa)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
