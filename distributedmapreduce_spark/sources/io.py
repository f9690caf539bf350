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
