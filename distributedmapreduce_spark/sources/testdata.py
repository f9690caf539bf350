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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a session-TZ-independent ``TIMESTAMP``
    (UTC instant, microsecond precision) across every parquet
    TIMESTAMP(NANOS) reading mode Spark has shipped:

    - pyspark < 4.1 + ``spark.sql.legacy.parquet.nanosAsLong``:
      nanos-since-epoch ``LongType`` → integer-divide to µs.
    - pyspark >= 4.1: native NANOS read yields ``TIMESTAMP_NTZ``
      (µs-truncated wall clock in UTC) — the legacy conf no longer
      changes the read.  ``convert_timezone('UTC', current_timezone(),
      ts)`` rewrites the NTZ wall clock from UTC to the session zone,
      so the subsequent (session-tz) NTZ→TIMESTAMP cast lands on the
      correct UTC instant under ANY session timezone.  (The naive
      ``to_utc_timestamp(cast(ts as timestamp), 'UTC')`` is an
      identity on the session-tz interpretation and shifts every
      instant by the tz offset under non-UTC sessions.)

    Every downstream ``unix_micros`` / ``withWatermark`` / ``window``
    call site relies on this single choke point — do NOT read
    events.parquet directly in plans (tests/test_loader_ts.py lints
    for this).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        # integer `div`, not `/`: double division loses µs precision
        # on ~1e18-ns epoch values (53-bit mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(t, TimestampNTZType):
        # no default arg: RuntimeConfig.get VALIDATES a provided
        # default against the conf's checker, and '' is not a legal
        # timezone — get(key, '') itself throws on a vanilla session
        try:
            tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        except Exception:
            tz = None
        if tz == "UTC":
            # fast path: under a UTC session the NTZ→TIMESTAMP cast IS
            # the UTC interpretation, and it costs one zone conversion
            # per row instead of two (~2x on events-scan-bound queries,
            # measured at sf0.1).  The session tz is read at PLAN BUILD
            # time — rebuild the frame if you change the conf after.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = df.withColumn(
                "ts",
                F.expr(
                    "cast(convert_timezone('UTC', current_timezone(), ts)"
                    " as timestamp)"
                ),
            )
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS), which
        # pre-4.1 vanilla SparkSessions refuse to read
        # (PARQUET_TYPE_ILLEGAL).  nanosAsLong is runtime-settable, so
        # enable it here instead of relying on the repo's own session
        # factory — the engine must work under ANY caller-provided
        # session (e.g. the driver's).  Under >= 4.1 the conf is
        # accepted but the read is natively NTZ; both modes are
        # normalized below.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
