"""Persisted index artifacts — the build/search split for ANN/MinHash.

At 100 TB an ANN or near-dup index is built ONCE and searched many
times; rebuilding it inside every query (or hiding it behind
``localCheckpoint``, which dies with the session) misprices the search
path and re-scans the corpus per run.  Indexes here are parquet tables
under ``spark-warehouse/indexes/``, keyed by a fingerprint of the
source parquet file (realpath + size + nanosecond mtime) AND the
build parameters (hash seeds, shingle width, K, a code-version
constant), so a changed corpus OR a changed build recipe invalidates
the artifact automatically — different scale factors never collide,
and editing e.g. _MINHASH_SEEDS can't silently serve a stale index.  Writes go to a temp dir and are atomically renamed in,
so concurrent builders race safely (first rename wins, losers discard).

The search-time contract: results are bit-identical whether the index
was just built or read back — builds are deterministic (seeded
centroids, fixed hash functions), and parquet round-trips the arrays
exactly.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_INDEX_ROOT = os.path.join(_REPO_ROOT, "spark-warehouse", "indexes")


# bump when an index build's CODE changes in a way the params tuple
# doesn't capture (e.g. a different aggregation producing the same
# schema) — folded into every fingerprint
_CODE_VERSION = 2


def _fingerprint(src_path: str, params: object = None) -> str:
    st = os.stat(src_path)
    key = (
        f"{os.path.realpath(src_path)}:{st.st_size}:{st.st_mtime_ns}:"
        f"v{_CODE_VERSION}:{params!r}"
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def index_path(kind: str, src_path: str, params: object = None) -> str:
    return os.path.join(
        _INDEX_ROOT, f"{kind}-{_fingerprint(src_path, params)}"
    )


def cached_index(
    spark: SparkSession,
    kind: str,
    src_path: str,
    build_fn,
    partition_by: str | None = None,
    params: object = None,
) -> DataFrame:
    """Return the index table for (kind, fingerprint(src_path)),
    building and persisting it on first use.

    ``build_fn`` is a zero-arg callable returning the index DataFrame;
    ``partition_by`` optionally partitions the artifact on disk (e.g.
    IVF assignments by cluster id, so a search probing nprobe lists
    reads only those partitions — partition pruning on the index
    scan); ``params`` is any repr-stable value capturing the build
    recipe (seeds, widths, K) — part of the cache key."""
    path = index_path(kind, src_path, params)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(_INDEX_ROOT, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        writer = build_fn().write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return spark.read.parquet(path)
