"""Format round-trip surface: parquet / csv / json / orc / text
readers+writers with schema preservation (the reference reads exactly
one format — plain text, S1 — but an engine replacing it needs the
standard lake formats; SURVEY.md §2.1 sources/sinks summary)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WRITE_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema=None
) -> DataFrame:
    """Schema-pinned read (inference is a correctness hazard for csv/
    json and a perf hazard everywhere — always pass the schema)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return getattr(reader, fmt)(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Hive-style partitioned layout: one directory per partition
    value.  At 100 TB this is what makes `WHERE pcol = x` a partition
    prune (directories never listed) instead of a full scan — the
    reader-side evidence is `PartitionFilters` in the scan node."""
    getattr(df.write.mode(mode).partitionBy(*partition_cols), fmt)(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (bucketBy requires saveAsTable): rows
    are hash-distributed into n_buckets files per partition by
    bucket_col.  Two tables bucketed the same way join WITHOUT a
    shuffle — the pre-partitioning replaces the exchange, the big
    win for repeated fact-fact joins at scale."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def compact(spark: SparkSession, path: str, out_path: str,
            target_files: int, fmt: str = "parquet") -> None:
    """Small-files compaction: rewrite a directory into target_files
    output files.  The classic lake-maintenance job — streaming sinks
    and over-parallel writers leave thousands of tiny files whose
    per-file open/footer cost dominates scans at 100 TB.  coalesce()
    avoids a shuffle when reducing file count (repartition() would be
    correct but pays a full shuffle)."""
    df = getattr(spark.read, fmt)(path)
    getattr(df.coalesce(target_files).write.mode("overwrite"), fmt)(out_path)
