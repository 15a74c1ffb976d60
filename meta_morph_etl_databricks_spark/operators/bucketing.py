"""Quantile bucketing (SURVEY.md C2, A10).

The reference computes loyalty tiers by ``approxQuantile([0.5, 0.8],
0.01)`` over per-customer spend, then a chained when/between back-join
(m_customer_sales_report_task.py:175-231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_cutoffs(
    df: DataFrame,
    value_col: str,
    probabilities: list[float],
    relative_error: float = 0.01,
    exact: bool = False,
) -> list[float]:
    """A10: quantile cutoffs.

    ``exact=False`` (default) is the scale path — Greenwald–Khanna sketch,
    one pass, mergeable across partitions, same rel-error the reference
    uses.  ``exact=True`` uses ``percentile_cont`` for oracle-comparable
    determinism in tests (approx sketches are ε-dependent, SURVEY.md §7.3).
    """
    if exact:
        row = df.select(
            *[
                F.expr(f"percentile_cont({p}) WITHIN GROUP (ORDER BY {value_col})").alias(f"p{i}")
                for i, p in enumerate(probabilities)
            ]
        ).first()
        return [row[f"p{i}"] for i in range(len(probabilities))]
    return df.approxQuantile(value_col, probabilities, relative_error)


def tier_column(value_col: str, cutoffs: list[float], labels: list[str]) -> F.Column:
    """Chained when/between tiering: len(labels) == len(cutoffs) + 1.
    Boundary semantics mirror the reference (between is inclusive both
    ends; reference tiers: < p50 → low, [p50, p80] → mid, > p80 → high,
    m_customer_sales_report_task.py:191-200).

    NULL values tier to NULL: every ``when`` comparison on NULL is NULL
    (not false), so without the explicit guard a NULL value would fall
    through the whole chain into ``otherwise`` and be awarded the TOP
    tier — a group with no measurable value silently ranked above every
    real one."""
    if len(labels) != len(cutoffs) + 1:
        raise ValueError("need one more label than cutoffs")
    c = F.col(value_col)
    expr = F.when(c.isNull(), F.lit(None).cast("string")).when(c < cutoffs[0], labels[0])
    for i in range(1, len(cutoffs)):
        expr = expr.when(c.between(cutoffs[i - 1], cutoffs[i]), labels[i])
    return expr.otherwise(labels[-1])


def quantile_buckets(
    detail: DataFrame,
    group_key: str,
    value_col: str,
    probabilities: list[float],
    labels: list[str],
    tier_col_name: str = "tier",
    exact: bool = False,
) -> DataFrame:
    """C2 composite: groupBy-sum → cutoffs → tier label → broadcast join
    back to detail rows.

    Scale: the agg shuffles once on ``group_key``; cutoff computation is a
    sketch merge at the driver (O(groups) not O(rows)); the back-join
    broadcasts the small per-group tier table instead of re-shuffling the
    detail side.
    """
    agg = detail.groupBy(group_key).agg(F.sum(F.col(value_col)).alias("_agg_value"))
    cutoffs = quantile_cutoffs(agg, "_agg_value", probabilities, exact=exact)
    tiers = agg.withColumn(tier_col_name, tier_column("_agg_value", cutoffs, labels)).drop("_agg_value")
    return detail.join(F.broadcast(tiers), group_key)
