"""Solution-store parity (reference operators S15/S16/S19).

The reference's output sink is a JSON-file KV namespace with
upsert-by-key (last-writer-wins) and point lookup returning ``False``
on a missing key (database_server.py:88-116); the driver scp's the
JSON file home (driver.py:144).

Spark-native equivalent: a partitioned parquet relation with MERGE-like
upsert semantics (anti-join + union — the Delta-less formulation),
point lookup via a key filter (pushed down to the parquet scan), and
export via collect/toPandas.  Keys are strings, values one column of
any type — the store is relational, not dynamically typed: one store
per value schema (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SolutionStore:
    """Keyed result store backed by parquet at ``path``.

    upsert(df): last-writer-wins per key (S15's overwrite semantics).
    get(key):   value or None (the reference returns False; None is the
                Pythonic spelling of the same contract).
    """

    def __init__(
        self, spark: SparkSession, path: str, key_col: str = "key"
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self._exists = False

    def _current(self) -> DataFrame | None:
        if not self._exists:
            try:
                return self.spark.read.parquet(self.path)
            except Exception:  # noqa: BLE001 — first write, nothing there yet
                return None
        return self.spark.read.parquet(self.path)

    def upsert(self, df: DataFrame) -> None:
        """MERGE by key without Delta: keep current rows whose key is
        absent from the batch (left_anti), union the new batch.  The
        anti-join shuffles only on the key; at warehouse scale you'd
        swap this for Delta/Iceberg MERGE INTO keeping the same
        semantics."""
        current = self._current()
        if current is not None:
            keep = current.join(
                F.broadcast(df.select(self.key_col).distinct()),
                self.key_col,
                "left_anti",
            )
            df = keep.unionByName(df)
        # parquet has no in-place rewrite: stage to a temp dir then swap
        tmp = self.path + ".staging"
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        self._exists = True

    def get(self, key: Any) -> Any | None:
        """Point lookup; the key predicate reaches the parquet scan
        (PushedFilters), so only matching row groups are read."""
        current = self._current()
        if current is None:
            return None
        rows = current.filter(F.col(self.key_col) == key).limit(2).collect()
        if not rows:
            return None
        if len(rows) > 1:
            # upsert() guarantees key uniqueness; duplicates mean the
            # backing parquet was written externally. Fail loudly with
            # the key instead of a bare unpack ValueError.
            raise ValueError(
                f"duplicate rows for key {key!r} in solution store "
                f"{self.path} — written outside upsert()?"
            )
        (row,) = rows
        others = [c for c in row.asDict() if c != self.key_col]
        if len(others) == 1:
            return row[others[0]]
        return {c: row[c] for c in others}

    def to_local(self) -> dict[Any, Any]:
        """S19: collect the whole store to the client (small results)."""
        current = self._current()
        if current is None:
            return {}
        out = {}
        for row in current.collect():
            d = row.asDict()
            k = d.pop(self.key_col)
            out[k] = next(iter(d.values())) if len(d) == 1 else d
        return out
