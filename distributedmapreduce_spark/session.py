"""SparkSession factory tuned for this engine.

Local-mode defaults target the test/bench environment (local[N] on one
big box); every setting is also the right starting point on a real
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), UTC session timezone (required for the DuckDB oracle
comparison), Arrow enabled for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "distributedmapreduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    ansi: bool | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores.  Shuffle
    partitions default to the core count — at cluster scale you would
    size this to total executor cores (or leave AQE's coalescing to
    shrink an intentionally-high number).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 turned ANSI mode on by default; its runtime overflow
        # / cast checks cost ~10-20% on aggregate-heavy plans and the
        # engine's query surface was validated under ANSI-off Spark 3
        # semantics (r01/r02 gates) as well as ANSI-on 4.1 (r03) — the
        # queries are well-typed under both.  Posture (ADVICE r04):
        # correctness surfaces (tests, oracle checker) pass ansi=True
        # so int64 overflow past a plan's documented headroom FAILS
        # LOUDLY; benchmarks keep the faster non-ANSI mode.
        .config(
            "spark.sql.ansi.enabled",
            str(ansi).lower()
            if ansi is not None
            else os.environ.get("SPARK_GRAFT_ANSI", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as long and convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # lets Python DataSources (sources/kvjson.py) accept pushed
        # key predicates; harmless when no such source is read
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_caches(spark: SparkSession) -> None:
    """Session-level cache cleanup hook (ADVICE r08 llm5.py:349).

    Cache RETENTION inside queries is deliberate policy, not a leak:
    every query returns a LAZY plan that reads its persisted
    intermediates at execution time (an in-function unpersist would
    silently re-derive them — see plans/llm.py:295), and repeated
    invocations of the same query rely on plan-equal cache hits for
    their measured perf (SCALE.md §10l).  What retention costs is
    accumulation across MANY DIFFERENT queries in one long session —
    hundreds of MEMORY_AND_DISK blocks competing under LRU.  Long
    sweeps (tools/check_oracle.py full registry) call this between
    cohorts to bound that accumulation; per-query callers should not.
    """
    spark.catalog.clearCache()
