from .registry import ORACLES, QUERIES, query

__all__ = ["ORACLES", "QUERIES", "query"]
