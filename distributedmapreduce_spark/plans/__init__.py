from .registry import QUERIES, ORACLES, get_registry

__all__ = ["QUERIES", "ORACLES", "get_registry"]
