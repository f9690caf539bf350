"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count + column names + order-insensitive
values.  Usage:

    python3 tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows), key=repr
    )


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from distributedmapreduce_spark.session import get_spark

    only = set(sys.argv[1:])
    if os.environ.get("SPARK_GRAFT_VANILLA") == "1":
        # driver-parity mode: a bare SparkSession with NONE of the
        # engine factory's settings — every query must still pass
        # (the engine may not assume its own session configuration;
        # round 1's six failures were exactly such an assumption)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("check_oracle_vanilla")
            .config("spark.driver.memory", "16g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="check_oracle", cpus=16, driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset (tools/gen_scale.py)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(
                f"ROWS  {name}: {len(srows)} rows, cols={scols} "
                f"({time.time()-t0:.1f}s) [rows-only]"
            )
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = _rows_to_multiset(srows, scols) == _rows_to_multiset(
                drows, dcols
            )
        status = "PASS " if (ok_cols and ok_count and ok_vals) else "FAIL "
        if status == "FAIL ":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else (scols, dcols)} "
            f"vals={'ok' if ok_vals else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if not ok_vals and ok_cols and ok_count:
            sm = _rows_to_multiset(srows, scols)
            dm = _rows_to_multiset(drows, dcols)
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            for a, b in diff:
                print(f"        spark={a}\n        duck ={b}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
