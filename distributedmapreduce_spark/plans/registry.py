"""Assembled query registry: importing the query modules populates
``plans.core._REGISTRY`` via their ``@query`` decorators."""

from __future__ import annotations

from . import (  # noqa: F401  (registration via @query decorators)
    llm,
    llm2,
    mmq,
    relational,
    relational2,
    streamq,
    textq,
    tpch,
)
from .core import Query, registry


def get_registry() -> dict[str, Query]:
    return registry()


QUERIES = {name: q.fn for name, q in registry().items()}
ORACLES = {name: q.oracle for name, q in registry().items() if q.oracle}
