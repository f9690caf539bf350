"""Synthesize a larger scale factor from /root/testdata/sf0.1 by
key-shifted replication, to measure the engine's scaling curve
(SCALE.md §9).  Usage:

    python3 tools/gen_scale.py [REPLICAS] [OUT_DIR] [TABLE ...]

Defaults: 10 replicas -> /tmp/sfscale (≈ sf1: lineitem ~6M rows),
all tables.  Naming specific tables (e.g. ``documents embeddings``)
writes only those — the dedup/ANN growth sweeps don't need a 60M-row
lineitem.

Replication semantics (join keys shift together so query semantics
scale linearly instead of degenerating):
- orderkey/custkey/suppkey/partkey/event_id/user_id/doc_id/vec_id
  shift by replica * STRIDE in every table that carries them;
- nation/region stay fixed (real dimensions don't grow with facts);
- document text gets a per-replica suffix token so the corpus grows
  without becoming one giant exact-duplicate class (dedup workloads
  then scale by corpus size, not by quadratic duplicate blowup).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributedmapreduce_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
STRIDE = 10**12

SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    only = set(sys.argv[3:])
    spark = get_spark(app_name="gen_scale")
    from distributedmapreduce_spark.sources.testdata import load_table

    for table, keys in SHIFT_COLS.items():
        if only and table not in only:
            continue
        # the engine loader, not a raw read: events.ts arrives as
        # TIMESTAMP(NANOS) and must be written back as a standard
        # micros timestamp so the replica is readable by any engine
        # (a raw read under nanosAsLong would persist ts as BIGINT)
        src = load_table(spark, table, SRC)
        if not keys:  # fixed dimensions
            src.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
            continue
        parts = []
        for i in range(replicas):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            if table == "documents":
                df = df.withColumn(
                    "text", F.concat("text", F.lit(f" replica{i}"))
                )
            parts.append(df)
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        unioned.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {replicas}x written")


if __name__ == "__main__":
    main()
