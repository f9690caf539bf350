"""Phase profiler for the embedding-family queries (VERDICT r13 #2).

For each named query, times (a) the QUERIES[name](spark, sf) CALL —
which runs every eager driver-side job (trainer rounds, collects) —
and (b) the noop materialization of the returned plan, separately,
over N repetitions after a warm-up.  Also reports the Spark job count
per phase via a job-group listener proxy (statusTracker job IDs).

Usage: python3 tools/profile_embed.py [-n RUNS] QUERY [QUERY ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if "-n" in args:
        i = args.index("-n")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from distributedmapreduce_spark.plans.registry import QUERIES
    from distributedmapreduce_spark.session import get_spark

    spark = get_spark(app_name="profile_embed")
    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in args:
        _materialize(QUERIES[name](spark, "/root/testdata/sf0.001"))
        _materialize(QUERIES[name](spark, sf_dir))
        best = None
        for _ in range(runs):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            _materialize(df)
            t2 = time.time()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            rec = {
                "construct_sec": round(t1 - t0, 3),
                "materialize_sec": round(t2 - t1, 3),
                "total_sec": round(t2 - t0, 3),
                "jobs": j1 - j0,
            }
            if best is None or rec["total_sec"] < best["total_sec"]:
                best = rec
        out[name] = best
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
