"""Window operators (SURVEY.md §2.6, W1–W3 + the full ranking family).

The reference's one window idiom is row_number-top-1 with a deterministic
multi-key tie-break (m_customer_metrics_task.py:176-195).  We expose it as
a named macro-operator (C1) plus the general ranking/analytic family the
SQL lab implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    keep_rank_column: bool = False,
) -> DataFrame:
    """C1: groupwise top-1 via row_number over a deterministic ordering.

    Callers MUST pass a total order (tie-break down to a unique key) or
    results are partition-order-dependent — the reference gets this right
    with ``desc(cnt), asc(payment_mode)`` (W1) and we enforce the habit.

    Scale: one hash shuffle on ``partition_by``; AQE handles skewed
    groups.  For heavy skew prefer groupBy().agg(max_by(...)) which
    map-side combines — see aggregates.argmax_per_group.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("_rnk", F.row_number().over(w)).filter(F.col("_rnk") == 1)
    return ranked if keep_rank_column else ranked.drop("_rnk")
