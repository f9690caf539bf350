"""Dump .explain("formatted") for bench-tier queries to plans/<round>/.

Usage:
    python3 tools/dump_bench_plans.py SUFFIX [QUERY ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<SUFFIX>.txt (round
defaults to r14) for each named query (default: every HEADLINE +
TIER2 query in bench.py).  SUFFIX is usually "before" or "after".
Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plan shape, not data volume,
is what these files pin, but the bench SF keeps AQE/broadcast
estimates honest).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributedmapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    suffix = sys.argv[1]
    names = sys.argv[2:]

    import bench
    from distributedmapreduce_spark.plans.registry import QUERIES

    if not names:
        names = list(bench.HEADLINE) + list(bench.TIER2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="dump_bench_plans")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
