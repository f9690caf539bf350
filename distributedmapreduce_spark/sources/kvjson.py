"""Custom Python DataSource for the reference's KV-store JSON format.

The reference persists results as one JSON object per store —
``{"word": [offsets...], ...}`` (database_server.py:88-116 writes it,
driver.py:144 scp's it home; /root/reference/solution_database.json is
the packaged example).  This module makes that format a first-class
Spark source/sink via the Spark 4 Python DataSource API
(pyspark.sql.datasource), so a reference user can
``spark.read.format("kvjson").load(path)`` their existing stores:

- **read**: rows ``(key string, value string)`` where ``value`` is the
  JSON serialization of the stored value (the store is dynamically
  typed; JSON text is the lossless relational spelling).  The single
  JSON object is split across ``numPartitions`` readers by a
  deterministic md5 hash of the key, so downstream stages start
  parallel — the FORMAT is single-file, the scan need not be.
- **write**: each task writes its partition as a JSON part object;
  ``commit`` merges the parts into one reference-format store file
  (last writer wins on duplicate keys within a single save, matching
  the reference's upsert semantics).

For warehouse-scale stores, SolutionStore (operators/kvstore.py) over
parquet is the real path; this source exists for format parity with
the reference's on-disk artifacts.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _key_shard(key: str, n: int) -> int:
    """Deterministic shard id (md5, not Python's salted hash())."""
    return int.from_bytes(
        hashlib.md5(key.encode("utf-8")).digest()[:4], "big"
    ) % n


@dataclass
class _Shard(InputPartition):
    idx: int
    n: int
    path: str


class KVJsonReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvjson requires a path (load(<path>))")
        self.n = int(options.get("numPartitions", "8"))
        self._keys: set[str] | None = None  # pushed point-lookup keys

    def partitions(self) -> list[_Shard]:
        if self._keys is not None:
            shards = sorted({_key_shard(k, self.n) for k in self._keys})
            if not shards:  # contradictory filters -> one no-op shard
                return [_Shard(-1, self.n, self.path)]
            return [_Shard(i, self.n, self.path) for i in shards]
        return [_Shard(i, self.n, self.path) for i in range(self.n)]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        # Each task re-reads the (single-file) store and yields its
        # hash slice; the file read is the irreducible cost of the
        # format, the slicing is what lets downstream stages fan out.
        if partition.idx < 0:
            return
        with open(partition.path, "r", encoding="utf-8") as f:
            store = json.load(f)
        if self._keys is not None:
            for k in sorted(self._keys):
                if _key_shard(k, partition.n) == partition.idx and k in store:
                    yield (k, json.dumps(store[k], sort_keys=True))
            return
        for k, v in store.items():
            if _key_shard(k, partition.n) == partition.idx:
                yield (k, json.dumps(v, sort_keys=True))


class KVJsonPushdownReader(KVJsonReader):
    """Reader with key-predicate pushdown.  Opt-in via
    ``.option("pushdown", "true")`` because merely DEFINING
    pushFilters makes Spark reject every read unless
    ``spark.sql.python.filterPushdown.enabled`` is also true (our
    session helper sets it; a vanilla session must opt in to both)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Point-lookup pushdown: EqualTo/In on ``key`` are handled
        fully at the source (scan planning prunes to the shards that
        can hold those keys — the kvjson spelling of partition
        pruning); every other filter is handed back for Spark to
        apply post-scan."""
        for f in filters:
            vals = None
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                if isinstance(f.value, str):
                    vals = {f.value}
            elif isinstance(f, In) and f.attribute == ("key",):
                if all(isinstance(v, str) for v in f.value):
                    vals = set(f.value)
            if vals is None:
                yield f  # unsupported — Spark re-applies it
            else:
                self._keys = (
                    vals if self._keys is None else self._keys & vals
                )


@dataclass
class _PartFile(WriterCommitMessage):
    part_path: str


class KVJsonWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvjson requires a path (save(<path>))")
        self.overwrite = overwrite
        self.staging = self.path + ".parts"

    def write(self, rows: Iterator) -> _PartFile:
        os.makedirs(self.staging, exist_ok=True)
        part: dict[str, object] = {}
        for row in rows:
            part[row[0]] = json.loads(row[1])
        part_path = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.json")
        with open(part_path, "w", encoding="utf-8") as f:
            json.dump(part, f)
        return _PartFile(part_path)

    def commit(self, messages: list[_PartFile]) -> None:
        if os.path.exists(self.path) and not self.overwrite:
            raise FileExistsError(
                f"{self.path} exists and mode is not overwrite"
            )
        merged: dict[str, object] = {}
        for m in messages:
            with open(m.part_path, "r", encoding="utf-8") as f:
                merged.update(json.load(f))
            os.remove(m.part_path)
        os.rmdir(self.staging)
        with open(self.path, "w", encoding="utf-8") as f:
            json.dump(merged, f)

    def abort(self, messages: list[_PartFile]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.part_path):
                os.remove(m.part_path)


class KVJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: treats the store as an upsert log consumed
    in sorted-key order behind a KEY HIGH-WATERMARK offset
    (``{"last": <largest key emitted>}``).  A static file yields one
    batch with every pair and then idles; a store that grows by
    upsert yields the keys above the watermark on each poll.
    readBetweenOffsets replays exactly the committed (start, end]
    key range, which is what makes failure recovery deterministic.
    Honest limits of watermarking a mutable JSON object: a new key
    that sorts BELOW the watermark, or an updated value of an
    already-emitted key, is not re-detected — the format has no
    change log; for the reference's stores (S15 upserts that add
    result keys) the high watermark is exactly right, and unlike a
    count-based offset it never re-emits or misposition-slices when
    a key lands mid-order."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvjson requires a path (load(<path>))")

    def _load(self) -> dict:
        with open(self.path, "r", encoding="utf-8") as f:
            return json.load(f)

    def initialOffset(self) -> dict:
        return {"last": None}

    def read(self, start: dict):
        store = self._load()
        last = start.get("last")
        keys = sorted(k for k in store if last is None or k > last)
        rows = [(k, json.dumps(store[k], sort_keys=True)) for k in keys]
        end = {"last": keys[-1]} if keys else dict(start)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        store = self._load()
        lo, hi = start.get("last"), end.get("last")
        keys = sorted(
            k
            for k in store
            if (lo is None or k > lo) and (hi is not None and k <= hi)
        )
        return iter((k, json.dumps(store[k], sort_keys=True)) for k in keys)

    def commit(self, end: dict) -> None:
        pass


class KVJsonDataSource(DataSource):
    """``spark.read.format("kvjson")`` / ``df.write.format("kvjson")``
    for reference-format JSON KV stores."""

    @classmethod
    def name(cls) -> str:
        return "kvjson"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema: StructType) -> KVJsonReader:
        if self.options.get("pushdown", "").lower() == "true":
            return KVJsonPushdownReader(self.options)
        return KVJsonReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KVJsonWriter:
        return KVJsonWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> KVJsonStreamReader:
        return KVJsonStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the kvjson format on a session."""
    spark.dataSource.register(KVJsonDataSource)
