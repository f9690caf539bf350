"""Registry integrity: the driver contract exports every query, and
the registry can only grow — a structural edit that silently swallows
a neighboring @query definition (it happened) must fail CI."""

from __future__ import annotations

from distributedmapreduce_spark.plans.registry import get_registry

MIN_QUERIES = 94
MIN_ORACLES = 84


def test_registry_size_floor():
    reg = get_registry()
    assert len(reg) >= MIN_QUERIES, sorted(reg)
    assert sum(1 for q in reg.values() if q.oracle) >= MIN_ORACLES


def test_registry_entries_well_formed():
    for name, q in get_registry().items():
        assert callable(q.fn), name
        assert q.fn.__doc__ or q.oracle, f"{name}: no doc and no oracle"
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name


def test_driver_contract_exports_registry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    reg = get_registry()
    assert set(m.queries()) == set(reg)
    assert set(m.oracle_sql()) == {k for k, q in reg.items() if q.oracle}
