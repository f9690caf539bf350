"""Text-file source (reference operator S1: master.py:34-41).

The reference reads one local text file with ``readlines()``.  The
Spark-native equivalent is ``spark.read.text`` — one ``value`` column
per line, newline stripped, splittable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Scan a text file -> DataFrame[value: string], one row per line.

    Note on reference parity: ``readlines()`` keeps the trailing
    newline, so the reference's blank-line test is ``line == "\\n"``
    (master.py:42); with ``spark.read.text`` the same line arrives as
    ``""`` — downstream operators test for the empty string instead.
    """
    return spark.read.text(path)
