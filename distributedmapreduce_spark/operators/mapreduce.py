"""Generalized MapReduce facade — the reference's programming model.

The reference's entire "query language" is a job spec
(input_info.json:1-8): a mapper .py, a reducer .py, and M/R
parallelism degrees; the master ships arbitrary user Python to
workers (master.py:66, remote_process_starter.sh:3).  This module
reproduces that capability Spark-natively:

- ``map_reduce(df, mapper, reducer, num_partitions)`` runs any
  row -> [(key, value)] mapper and any (key, values) -> result
  reducer.  The shuffle, barrier, and bucket store of the reference
  (database_server.py's reducer namespace, master.py:128-133) are
  Spark's own shuffle + stage boundary.
- Custom partitioners (the reference's ``len(word) % R``,
  mapper_word_count.py:24-30) are supported for partition-count
  parity; results are partitioner-invariant because the partition
  function depends only on the key.

This is deliberately the RDD fidelity path: user code is opaque
Python, so there is nothing for Catalyst to optimize.  The packaged
jobs (word count / inverted index) ALSO exist as pure-DataFrame
pipelines in ``operators.text`` — that is the path that scales, and
tests assert the two produce identical results.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, Row


def map_reduce(
    df: DataFrame,
    mapper: Callable[[Row], Iterable[tuple[Any, Any]]],
    reducer: Callable[[Any, list[Any]], Any],
    num_partitions: int | None = None,
    partitioner: Callable[[Any], int] | None = None,
    output_schema: str = "key string, value string",
) -> DataFrame:
    """Run a user mapper/reducer pair over ``df``.

    mapper:  Row -> iterable of (key, value) pairs          (flatMap)
    reducer: (key, [values in arrival order]) -> one value  (per key)

    Equivalent of one full reference job (map stage -> shuffle ->
    barrier -> reduce stage -> solution store), returning the solution
    relation as a DataFrame with ``output_schema``.
    """
    spark = df.sparkSession
    pairs = df.rdd.flatMap(lambda row: list(mapper(row)))
    n = num_partitions or pairs.getNumPartitions()
    if partitioner is not None:
        grouped = pairs.groupByKey(numPartitions=n, partitionFunc=partitioner)
    else:
        grouped = pairs.groupByKey(numPartitions=n)
    reduced = grouped.map(lambda kv: (kv[0], reducer(kv[0], list(kv[1]))))
    return spark.createDataFrame(reduced, schema=output_schema)


# ---------------------------------------------------------------------------
# The two packaged jobs, expressed through the facade with the
# reference's own mapper/reducer logic (mapper_word_count.py:11-35,
# reducer_word_count.py:11-21, reducer_inverted_index.py:11-21).
# ---------------------------------------------------------------------------


def _tokenize_mapper(row: Row) -> Iterable[tuple[str, int]]:
    """The reference mapper: cleaned line + base offset -> (word, offset).

    Expects rows of the ``operators.text.lines`` schema
    (line, byte_offset).  Mirrors mapper_word_count.py:11-22: split on
    single space, skip empties, advance len(word)+1 per emitted token.
    """
    offset = row.byte_offset
    for tok in row.line.split(" "):
        if tok == "":
            continue
        yield (tok, offset)
        offset += len(tok) + 1


def length_hash_partitioner(num_reducers: int) -> Callable[[str], int]:
    """The reference's partitioner: ``len(word) % R``
    (mapper_word_count.py:28).  Key-functional, so grouping stays
    globally correct — but badly skewed; kept only for parity demos."""

    def part(word: str) -> int:
        return len(word) % num_reducers

    return part


def word_count_job(lines_df: DataFrame, num_reducers: int = 3) -> DataFrame:
    return map_reduce(
        lines_df,
        _tokenize_mapper,
        lambda _word, offsets: len(offsets),
        num_partitions=num_reducers,
        partitioner=length_hash_partitioner(num_reducers),
        output_schema="word string, count long",
    )


def inverted_index_job(lines_df: DataFrame, num_reducers: int = 3) -> DataFrame:
    return map_reduce(
        lines_df,
        _tokenize_mapper,
        lambda _word, offsets: sorted(offsets),
        num_partitions=num_reducers,
        partitioner=length_hash_partitioner(num_reducers),
        output_schema="word string, postings array<long>",
    )
