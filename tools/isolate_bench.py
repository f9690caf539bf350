"""Quiet-box isolation timer for individual registry queries.

Reproduces bench.py's measurement protocol (sf0.001 JIT warm-up, one
untimed steady-state round at the measured SF, then interleaved
min-of-N) for an arbitrary subset of queries, so a single suspicious
BENCH_r{N}.json reading can be adjudicated WITHOUT the surrounding
40-query session: no persisted caches from other families, no shared
page-cache pressure, no earlier queries' GC debt.  VERDICT r07 task 2
(degree_assortativity_copurchase +36% on an untouched plan) is the
motivating case.

Usage:
    python3 tools/isolate_bench.py [-n RUNS] QUERY [QUERY ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line {"queries": {name: min_sec}, "runs": N, "sf_dir": ...}.
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
    usage = "usage: isolate_bench.py [-n RUNS] QUERY ..."
    args = sys.argv[1:]
    runs = 5
    # accept -n anywhere (ADVICE r08: a trailing -n was silently
    # treated as a query name; a non-numeric RUNS was a traceback)
    if "-n" in args:
        i = args.index("-n")
        if i + 1 >= len(args):
            print(usage, file=sys.stderr)
            return 2
        try:
            runs = int(args[i + 1])
        except ValueError:
            print(f"{usage}\nRUNS must be an integer, got "
                  f"{args[i + 1]!r}", file=sys.stderr)
            return 2
        if runs < 1:
            print(f"{usage}\nRUNS must be >= 1", file=sys.stderr)
            return 2
        args = args[:i] + args[i + 2:]
    if not args:
        print(usage, file=sys.stderr)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from distributedmapreduce_spark.plans.registry import QUERIES
    from distributedmapreduce_spark.session import get_spark

    unknown = [n for n in args if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="isolate_bench")

    # identical discipline to bench.py: codegen warm-up at sf0.001,
    # then one untimed round at the measured SF to get past C2 JIT
    for name in args:
        _materialize(QUERIES[name](spark, "/root/testdata/sf0.001"))
    for name in args:
        _materialize(QUERIES[name](spark, sf_dir))

    timings = {name: float("inf") for name in args}
    for _ in range(runs):
        for name in args:
            t0 = time.time()
            _materialize(QUERIES[name](spark, sf_dir))
            timings[name] = min(timings[name], time.time() - t0)

    print(
        json.dumps(
            {
                "queries": {n: round(v, 3) for n, v in timings.items()},
                "runs": runs,
                "sf_dir": sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
