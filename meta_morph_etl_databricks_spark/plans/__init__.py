from .registry import QUERIES, ORACLES, register, query_fns, oracle_map

# Importing modules for their registration side effects.
from . import marts  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "query_fns", "oracle_map"]
