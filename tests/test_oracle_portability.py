"""Oracle portability lint: the DuckDB oracle strings must evaluate
to engine-version-stable types, or the driver's gate (whose DuckDB
version we don't control) can hash-mismatch a correct Spark result.

Round-2 lesson: two driver hash-fails (`sessionization`,
`sequence_packing`) were rows+schema green and unreproducible locally.
Both oracles leaked a version-fragile type into their OUTPUT:
- `sum(<integer>)` returns HUGEINT (INT128) in DuckDB, and the
  HUGEINT -> pandas dtype mapping differs across DuckDB releases;
- events.ts is parquet TIMESTAMP(NANOS): DuckDB <= 1.0 truncates to
  µs at read, >= 1.1 preserves ns (TIMESTAMP_NS), while Spark always
  truncates — ordering/interval arithmetic on the raw column then
  evaluates on values Spark never sees.

These tests pin the whole oracle corpus against both classes.
"""

from __future__ import annotations

import duckdb
import pytest

from distributedmapreduce_spark.plans.core import EVENTS_US
from distributedmapreduce_spark.plans.registry import get_registry

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# types whose cross-version behavior (pandas mapping, precision,
# comparison semantics) is not stable enough for a bit-identical gate
FRAGILE = ("HUGEINT", "UHUGEINT", "TIMESTAMP_NS", "TIME_NS")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_fragile_output_types(con):
    """Every oracle's output columns must be version-stable types."""
    offenders = {}
    for name, q in get_registry().items():
        if not q.oracle:
            continue
        rel = con.sql(q.oracle)
        fragile = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in FRAGILE or str(t).startswith("DECIMAL")
        ]
        if fragile:
            offenders[name] = fragile
    assert not offenders, offenders


def test_md5_uniform_sql_portable(con):
    """The oracle-side md5 uniform converts hex arithmetically
    (strpos per digit) instead of CAST('0x..' AS BIGINT), which only
    DuckDB >= 0.10 supports.  Assert the arithmetic form equals the
    hex-cast form bit-for-bit over the whole documents table (this
    host has a cast-capable DuckDB, so both forms evaluate)."""
    from distributedmapreduce_spark.plans.llm3 import _TWO32, _md5_uniform_sql

    hex_cast = (
        "CAST(concat('0x', substr(md5(concat('t:', "
        f"CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) / {_TWO32}"
    )
    n_bad = con.sql(
        f"SELECT count(*) FROM documents "
        f"WHERE {_md5_uniform_sql('t', 'doc_id')} <> {hex_cast}"
    ).fetchone()[0]
    assert n_bad == 0


def test_events_ts_oracles_are_microsecond_pinned():
    """Any oracle that touches events.ts must read it through the
    µs-pinned EVENTS_US relation (CAST(ts AS TIMESTAMP)) so DuckDB
    can never see more timestamp precision than Spark does."""
    unpinned = []
    for name, q in get_registry().items():
        if not q.oracle:
            continue
        sql = q.oracle
        mentions_events = "events" in sql
        mentions_ts = " ts" in sql or "(ts" in sql or ".ts" in sql
        if mentions_events and mentions_ts and EVENTS_US not in sql:
            unpinned.append(name)
    assert not unpinned, unpinned


def test_hugeint_double_cast_matches_python(con):
    """The int128 sufficient-statistic construct (spearman: Spark
    decimal(38,0) sums == DuckDB HUGEINT sums, consumed via CAST(x AS
    DOUBLE) in the rho chain) relies on HUGEINT→DOUBLE being
    round-to-nearest exactly like Python's int→float — including
    values past 2^63 where BIGINT would have overflowed.  Pin it."""
    vals = [
        0,
        1,
        2**53 + 1,
        2**63 - 1,
        2**63 + 12345,
        5 * 10**19 + 7,
        2**90 + 999,
    ]
    for v in vals:
        got = con.sql(
            f"SELECT CAST(CAST({v // 2} AS HUGEINT) * 2 + {v % 2}"
            " AS DOUBLE)"
        ).fetchone()[0]
        assert got == float(v), (v, got)
