"""Rewrite-bytes audit for the stream-maintained index (VERDICT r11
task 1's measurement pin).

The claim under test: ``operators/index_store.advance_index`` is
O(delta) per micro-batch — the bytes it writes are proportional to
the BATCH, not to the accumulated INDEX.  The old swap-in-place
design rewrote the whole artifact per batch (O(index), the r11
``weak``); the log-structured rewrite appends one delta-sized segment
and amortizes compaction.  This tool feeds B equal-sized batches of
the sf0.1 documents table through ``advance_index`` and measures, per
batch, the bytes that appeared on disk (segment written + any
compaction output), then reports the regression of per-batch appended
bytes against batch number: a slope ≈ 0 (flat) is O(delta); the old
design's slope was ≈ one batch's worth of parquet per batch (linear
growth, total O(N·B)).

Usage:
    python3 tools/index_cost_audit.py [--batches=12] [--compact-every=8]

Prints one JSON line, pair-growth-audit style, for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    batches = 12
    compact_every = 8
    for arg in sys.argv[1:]:
        if arg.startswith("--batches="):
            batches = int(arg.split("=", 1)[1])
        elif arg.startswith("--compact-every="):
            compact_every = int(arg.split("=", 1)[1])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from distributedmapreduce_spark.operators.index_store import (
        advance_index,
        read_stream_index,
        stream_index_path,
    )
    from distributedmapreduce_spark.plans.llm import _pmh_signatures

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("index-cost-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("b", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(batches)))
        .persist()
    )
    n_docs = docs.count()

    kind = "cost-audit"
    token = f"audit-{os.getpid()}-{batches}-{compact_every}"
    path = stream_index_path(kind, token, params=("audit",))
    per_batch = []
    try:
        prev_bytes = 0
        for b in range(batches):
            delta = docs.filter(F.col("b") == b).drop("b")
            t0 = time.time()
            advance_index(
                spark, kind, token, _pmh_signatures(delta), b,
                params=("audit",), compact_every=compact_every,
            )
            dt = time.time() - t0
            now = _tree_bytes(path)
            per_batch.append(
                {
                    "batch": b,
                    "appended_bytes": now - prev_bytes,
                    "index_bytes": now,
                    "sec": round(dt, 3),
                    "compacted": b > 0 and (b + 1) % compact_every == 0,
                }
            )
            prev_bytes = now
        # sanity: the maintained artifact holds every doc exactly once
        assert read_stream_index(spark, path).count() == n_docs

        # O(delta) verdict: regress appended bytes on batch number over
        # NON-compaction batches.  Old design: slope ≈ +1 batch-size per
        # batch.  New design: slope ≈ 0 (each append is one delta).
        pts = [
            (r["batch"], r["appended_bytes"])
            for r in per_batch
            if not r["compacted"]
        ]
        mx = sum(x for x, _ in pts) / len(pts)
        my = sum(y for _, y in pts) / len(pts)
        denom = sum((x - mx) ** 2 for x, _ in pts) or 1.0
        slope = sum((x - mx) * (y - my) for x, y in pts) / denom
        mean_delta = my
        index_bytes = per_batch[-1]["index_bytes"]
        print(
            json.dumps(
                {
                    "audit": "index_rewrite_bytes",
                    "batches": batches,
                    "compact_every": compact_every,
                    "docs": n_docs,
                    "mean_append_bytes": int(mean_delta),
                    "final_index_bytes": index_bytes,
                    "append_to_index_ratio": round(
                        mean_delta / index_bytes, 4
                    ),
                    "bytes_slope_per_batch": int(slope),
                    "slope_over_mean_append": round(
                        slope / mean_delta, 4
                    ),
                    "o_delta": abs(slope) < 0.2 * mean_delta,
                    "per_batch": per_batch,
                }
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
        docs.unpersist()
        spark.stop()


if __name__ == "__main__":
    main()
