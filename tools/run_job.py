"""Job-spec runner — lifecycle parity with the reference's driver.

The reference's user entry point is ``driver.py`` + ``input_info.json``
(driver.py:86-97): a spec naming the input file, M mappers, R reducers,
and a mapper/reducer .py pair; the master then provisions VMs and runs
the job (master.py:179-193).  Here the "cluster provisioning" half is
Spark's cluster manager's job; this runner reproduces the SPEC
contract: feed it the same-shaped JSON and it executes the job
end-to-end and writes the solution as a ``{key: value}`` JSON file,
the shape of the reference's solution_database.json
(database_server.py:108-116).

Usage::

    python3 tools/run_job.py input_info.json [--out solution.json]
        [--check /root/reference/solution_database.json]

Spec fields (reference-shaped; project_id and friends are ignored —
there is no cloud to provision):

- ``input_file_location``: text file to process
- ``no_of_mappers``: map parallelism hint -> input-split sizing
  (maxPartitionBytes = ceil(file_size / M)); offsets stay globally
  correct at ANY split count via the distributed prefix sum
- ``no_of_reducers``: reduce parallelism (shuffle partition count)
- ``mapper_file`` / ``reducer_file``: the reference's packaged pairs
  (``mapper_word_count.py``/``reducer_word_count.py`` or
  ``mapper_inverted_index.py``/``reducer_inverted_index.py``) dispatch
  to the facade jobs in ``operators.mapreduce``; any OTHER pair is
  treated as arbitrary user Python — each file must define
  ``map_fn(row) -> iterable[(key, value)]`` /
  ``reduce_fn(key, values) -> value`` (the Spark-importable spelling
  of the reference's script-shaped workers), plus optionally
  ``OUTPUT_SCHEMA`` on the reducer module.

``--check`` compares the produced solution order-insensitively against
a reference JSON (posting lists compared as multisets) and exits
non-zero on mismatch — running the packaged inverted-index spec over
/root/reference/input.txt reproduces solution_database.json exactly.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# Spark's Python WORKERS import distributedmapreduce_spark too (the
# facade jobs ship cloudpickled closures over its functions).  Workers
# inherit PYTHONPATH, not the driver's sys.path — without this, running
# run_job from any cwd outside the repo (the natural usage: specs name
# inputs relative to the job directory) dies in the executor with
# ModuleNotFoundError.  Must be set before the SparkSession starts.
os.environ["PYTHONPATH"] = _REPO_ROOT + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)


def _load_user_fn(py_path: str, fn_name: str):
    spec = importlib.util.spec_from_file_location(
        os.path.basename(py_path).removesuffix(".py"), py_path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, fn_name):
        raise SystemExit(
            f"{py_path} does not define {fn_name}(); arbitrary-Python jobs "
            "must expose map_fn/reduce_fn (see tools/run_job.py docstring)"
        )
    return mod, getattr(mod, fn_name)


def run_spec(spark, spec: dict) -> "dict":
    from distributedmapreduce_spark.operators import mapreduce as mr
    from distributedmapreduce_spark.operators.text import lines
    from distributedmapreduce_spark.sources.text import read_text_lines

    input_path = spec["input_file_location"]
    if not os.path.isabs(input_path) and not os.path.exists(input_path):
        # reference specs name the input relative to the spec's own
        # directory (input_info.json sits next to input.txt); fall back
        # to that when the cwd-relative path doesn't resolve
        spec_dir = spec.get("__spec_dir__")
        if spec_dir and os.path.exists(os.path.join(spec_dir, input_path)):
            input_path = os.path.join(spec_dir, input_path)
    n_map = int(spec.get("no_of_mappers", 3))
    n_red = int(spec.get("no_of_reducers", 3))
    mapper = os.path.basename(spec["mapper_file"])
    reducer = os.path.basename(spec["reducer_file"])

    # M as an input-split hint: cap split size at ceil(size/M) so the
    # scan yields >= M partitions (the reference hard-partitions the
    # file across M VMs; Spark's splits + the distributed prefix sum
    # give the same offsets at any parallelism)
    size = max(1, os.path.getsize(input_path))
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(math.ceil(size / n_map))
    )
    lines_df = lines(read_text_lines(spark, input_path))

    packaged = {
        ("mapper_word_count.py", "reducer_word_count.py"): mr.word_count_job,
        (
            "mapper_inverted_index.py",
            "reducer_inverted_index.py",
        ): mr.inverted_index_job,
    }
    job = packaged.get((mapper, reducer))
    if job is not None:
        out = job(lines_df, num_reducers=n_red)
    else:
        _, map_fn = _load_user_fn(spec["mapper_file"], "map_fn")
        red_mod, reduce_fn = _load_user_fn(spec["reducer_file"], "reduce_fn")
        out = mr.map_reduce(
            lines_df,
            map_fn,
            reduce_fn,
            num_partitions=n_red,
            output_schema=getattr(
                red_mod, "OUTPUT_SCHEMA", "key string, value string"
            ),
        )

    key_col, val_col = out.columns[0], out.columns[1]
    return {r[key_col]: r[val_col] for r in out.collect()}


def _canon(solution: dict) -> dict:
    return {
        k: sorted(v) if isinstance(v, list) else v
        for k, v in solution.items()
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("spec", help="input_info.json-shaped job spec")
    ap.add_argument("--out", default=None, help="solution JSON path")
    ap.add_argument(
        "--check", default=None, help="reference solution JSON to compare"
    )
    args = ap.parse_args()

    with open(args.spec) as f:
        spec = json.load(f)
    spec["__spec_dir__"] = os.path.dirname(os.path.abspath(args.spec))

    from distributedmapreduce_spark.session import get_spark

    spark = get_spark(app_name="run_job", cpus=8, driver_memory="8g")
    solution = run_spec(spark, spec)

    # Default the output NEXT TO THE INVOKER (cwd), never next to the
    # spec: a spec living in a read-only snapshot (e.g. the reference
    # tree) must not have its golden solution overwritten.  Hard-guard
    # the reference tree and the --check target regardless of --out.
    out_path = os.path.abspath(
        args.out or os.path.join(os.getcwd(), "solution_database.json")
    )
    ref_root = os.path.realpath("/root/reference")
    if os.path.realpath(out_path).startswith(ref_root + os.sep):
        raise SystemExit(
            f"refusing to write into the read-only reference tree: {out_path}"
        )
    if args.check and os.path.realpath(out_path) == os.path.realpath(
        args.check
    ):
        raise SystemExit(
            f"--out and --check point at the same file: {out_path}"
        )
    if args.check:  # read the golden BEFORE any write can touch it
        with open(args.check) as f:
            want = json.load(f)
    with open(out_path, "w") as f:
        json.dump(solution, f)
    print(f"wrote {len(solution)} keys -> {out_path}")

    if args.check:
        if _canon(solution) == _canon(want):
            print(f"CHECK PASS vs {args.check}")
            return 0
        missing = set(want) - set(solution)
        extra = set(solution) - set(want)
        diff = [
            k
            for k in set(want) & set(solution)
            if _canon({k: want[k]}) != _canon({k: solution[k]})
        ]
        print(
            f"CHECK FAIL vs {args.check}: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]} value-diff={sorted(diff)[:5]}"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
