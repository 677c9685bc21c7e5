from .core import OracleIndex, search as oracle_search

__all__ = ["OracleIndex", "oracle_search"]
