"""Join operators (SURVEY.md §2.4, J1–J11).

Scale posture: dimension sides get explicit ``broadcast()`` hints (the
reference relies on Catalyst defaults, SURVEY.md §4 — fine at 60k rows,
load-bearing at 100 TB where a missed broadcast is a full fact shuffle).
Fact⨝fact equi-joins stay sort-merge and shuffle on their keys once; AQE
skew-join splits hot keys at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim(dim: DataFrame) -> DataFrame:
    """Hint a dimension for broadcast-hash join (no fact-side shuffle)."""
    return F.broadcast(dim)


def theta_left_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    theta: Column,
) -> DataFrame:
    """J2 — the reference's load-bearing quirk: the theta predicate lives
    IN THE ON CLAUSE of a left join (``order_status != 'Cancelled'`` —
    m_supplier_performance_task.py:88-94).  Rows failing the theta become
    NULL-extended, NOT dropped; moving the predicate to a WHERE would
    change results (SURVEY.md §7.3).  Physically still an equi-join: Spark
    hashes on the equi keys and evaluates theta as a residual filter."""
    return left.join(right, equi & theta, "left")


def trim_join(left: DataFrame, right: DataFrame, lkey: str, rkey: str, how: str = "left") -> DataFrame:
    """J4: expression-key equi join on ``trim(key)`` (reference joins
    whitespace-padded supplier ids, m_supplier_performance_task.py:70-77).
    Still hash-partitionable — Spark shuffles on the trimmed expression."""
    return left.join(right, F.trim(left[lkey]) == F.trim(right[rkey]), how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """J9 done right: the reference collects a list to the driver and uses
    ``isin`` (m_customer_sales_report_task.py:85-86,164-171) — O(driver
    memory).  A broadcast left-semi join is the scale-safe equivalent."""
    return left.join(F.broadcast(right), on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """J7/J8: the reference emulates anti-joins with outer join +
    NULL-filter (Raptor.py:280-289).  Native left_anti skips the
    NULL-extension entirely (no widened rows through the shuffle)."""
    return left.join(right, on, "left_anti")
