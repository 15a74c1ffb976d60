"""Repo-wide physical-plan audit: every registered query's plan is
built (never executed) and scanned for the anti-patterns that turn a
working sf0.1 query into a 100 TB incident:

- ``CartesianProduct`` / unconditioned ``BroadcastNestedLoopJoin`` —
  an accidental cross product grows O(n·m); the one sanctioned cross
  join in the repo (reconcile's one-row denominator) is a broadcast
  against a single aggregate row and is allowlisted by shape below.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in any hot path;
  Python is allowed only Arrow-batched (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``).

test_plans.py pins the *good* shapes of individual queries; this file
pins the *absence of bad* shapes across the whole registry, so a new
query can't quietly reintroduce one.
"""

from __future__ import annotations

import pytest

from meta_morph_etl_databricks_spark.plans import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    plans = {}
    for name, fn in QUERIES.items():
        try:
            plans[name] = _plan(fn(spark, sf_dir))
        except Exception as exc:  # a query that won't even plan is its own failure
            pytest.fail(f"{name} failed to build a plan: {exc}")
    return plans


def test_registry_covers_all_queries(all_plans):
    assert len(all_plans) == 50


def test_no_cartesian_products(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


# The one sanctioned cross join in the repo: reconcile's single-row
# total-mismatches denominator (quality/reconcile.py) — a broadcast
# nested loop against one global-aggregate row, cost O(n·1).
_SANCTIONED_CROSS = {"q_reconcile_summary"}


def test_no_unconditioned_nested_loop_joins(all_plans):
    """A ``Cross``-typed BroadcastNestedLoopJoin anywhere outside the
    allowlist is an accidental cross product.  The allowlisted query
    must still carry a global (keyless) aggregate — the one-row build
    side that keeps its cross join O(n)."""
    offenders = []
    for name, plan in all_plans.items():
        crosses = [
            b.splitlines()[0]
            for b in plan.split("BroadcastNestedLoopJoin")[1:]
            if "Cross" in b.splitlines()[0]
        ]
        if not crosses:
            continue
        if name not in _SANCTIONED_CROSS:
            offenders.append(name)
            continue
        assert len(crosses) == 1, f"{name}: {len(crosses)} cross joins, expected 1"
        assert "HashAggregate(keys=[], " in plan, (
            f"{name}: sanctioned cross join lost its one-row global-aggregate build side"
        )
    assert not offenders, offenders


def test_no_row_at_a_time_python(all_plans):
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_python_stages_are_arrow_batched(all_plans):
    """Any Python stage in any plan must be one of the Arrow-batched
    operators."""
    allowed = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    for name, plan in all_plans.items():
        for line in plan.splitlines():
            if "EvalPython" in line and not any(a in line for a in allowed):
                pytest.fail(f"{name}: non-Arrow Python stage: {line.strip()}")
