"""Declared-query registry (SURVEY.md §2.13).

Every operator the engine claims gets a named query over the testdata
star schema plus (where SQL-expressible) a DuckDB oracle with IDENTICAL
column aliases — the driver hash-compares values after sorting columns by
name, so alias parity is part of the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is the DuckDB-SQL
    equivalent (None → driver does a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_fns() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_map() -> dict[str, str]:
    return dict(ORACLES)
