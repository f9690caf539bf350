"""Assembled query registry: importing the query modules populates
``plans.core._REGISTRY`` via their ``@query`` decorators."""

from __future__ import annotations

from . import llm, mmq, relational, streamq, textq  # noqa: F401  (registration)
from .core import Query, registry


def get_registry() -> dict[str, Query]:
    return registry()


QUERIES = {name: q.fn for name, q in registry().items()}
ORACLES = {name: q.oracle for name, q in registry().items() if q.oracle}
