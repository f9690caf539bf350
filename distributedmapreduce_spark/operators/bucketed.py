"""Storage bucketing — the co-located-join layout.

At 100 TB the single biggest join cost is the shuffle of the fact
tables; Spark's storage bucketing (``bucketBy(n, key)`` +
``saveAsTable``) pre-partitions the files by hash(key) AT WRITE TIME
so a join between two tables bucketed on the same key with the same
bucket count runs with NO Exchange on either side — the layout
investment is paid once per table, then every subsequent join,
aggregation, or dedup on the bucket key is shuffle-free.  This module
is the build-or-reuse wrapper (the persisted-artifact discipline of
``operators/index_store.py``: fingerprint the source so a changed
corpus rebuilds automatically), and ``plans/relational2.py::
bucketed_join_lineitem_orders`` is the registered query whose
executed plan is pinned shuffle-free by ``tests/test_bucketed.py``.

Spark's in-memory catalog does not persist bucketing metadata across
sessions, so the table is (re)materialized the first time a session
asks for it and reused from the catalog for every later call in that
session — the same session-scoped reuse the ANN index relies on.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(src_path: str, key: str, n: int) -> str:
    st = os.stat(src_path)
    raw = f"{os.path.realpath(src_path)}:{st.st_size}:{st.st_mtime_ns}"
    raw += f":{key}:{n}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, n: int = 8
) -> DataFrame:
    """Return ``table`` from ``sf_dir`` as an ``n``-bucket table
    clustered AND sorted by ``key``, materializing it on first use in
    this session.  The name embeds a source fingerprint, so different
    scale factors (or a regenerated corpus) never serve a stale
    layout."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    name = f"{table}_b{n}_{_fingerprint(src, key, n)}"
    if not spark.catalog.tableExists(name):
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = os.path.join(wh.removeprefix("file:"), name)
        if os.path.exists(os.path.join(loc, "_SUCCESS")):
            # files from a previous session: the in-memory catalog
            # forgot the table, but the bucket ids live in the file
            # names — re-attach with explicit bucket DDL instead of
            # rewriting the layout (the whole point is paying the
            # write once)
            ddl = spark.read.parquet(loc).schema.toDDL()
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n} BUCKETS LOCATION '{loc}'"
            )
        else:
            (
                spark.read.parquet(src)
                .write.mode("overwrite")
                .bucketBy(n, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    return spark.table(name)
