"""C3: the PK-uniqueness gate (reference: DuplicateChecker,
utils.py:88-119 — called before every mart/ingest write).

The reference pre-repartitions on the PK and runs ``limit(1).count()``;
the groupBy shuffle already partitions by key, and ``isEmpty()`` is the
modern early-exit (SURVEY.md §4), so the gate here is a single partial-
aggregated existence probe (F7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.aggregates import dup_counts


class DuplicateException(Exception):
    """Raised when a declared primary key is violated (reference:
    custom DuplicateException, utils.py:84-86)."""


def assert_unique(df: DataFrame, keys: list[str], sample: int = 5) -> DataFrame:
    """Gate a write on PK uniqueness; returns ``df`` unchanged so it
    composes in a pipeline.  On violation raises with a bounded sample
    of offending keys (never an unbounded collect)."""
    dups = dup_counts(df, keys)
    offenders = dups.limit(sample).collect()
    if offenders:
        total = dups.count()
        detail = ", ".join(str(tuple(r[k] for k in keys)) for r in offenders)
        raise DuplicateException(
            f"{total} duplicate key group(s) for PK {keys}; first {len(offenders)}: {detail}"
        )
    return df
