"""Scalar/column expression helpers (SURVEY.md §2.9).

Everything here returns Catalyst ``Column`` expressions — JVM-side,
codegen-friendly, never Python UDFs (the reference has zero Python UDFs,
SURVEY.md §2.11; we keep that discipline).

Money math is DECIMAL-exact: float addition is order-dependent, and at
100 TB a shuffle's reduction order is nondeterministic run-to-run.
Decimal sums are associative/commutative → bit-stable results regardless
of partitioning, and identical to any exact oracle (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
MONEY_WIDE = "decimal(38,6)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    """Cast to exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money_round(col: Column, scale: int = 2) -> Column:
    """Final presentation form: exact decimal → round(scale) → double.
    Decimal ROUND is HALF_UP in both Spark and ANSI oracles, so both
    sides land on the identical nearest double."""
    return F.round(col.cast(MONEY_WIDE), scale).cast("double")


def net_price(price: Column | str, discount_fraction: Column | str) -> Column:
    """The reference's revenue kernel ``selling_price −
    selling_price*discount/100`` (m_supplier_performance_task.py:108-128;
    m_customer_sales_report_task.py:140-152), generalized to a
    fraction-form discount: ``price * (1 - d)`` in exact decimal."""
    return dec(price) * (F.lit(1).cast(MONEY) - dec(discount_fraction))


def pct_to_fraction(pct: Column | str) -> Column:
    """Reference discounts are percent 0–17 (Rest-API/main.py:182);
    testdata discounts are fractions.  Canonicalize percent → fraction."""
    return dec(pct, MONEY_WIDE) / F.lit(100).cast(MONEY)


def null_safe_sum(col: Column, zero: Column | None = None) -> Column:
    """A5: ``coalesce(sum(x), 0)`` — outer-join NULL groups become 0
    (m_customer_metrics_task.py:134-147)."""
    return F.coalesce(F.sum(col), zero if zero is not None else F.lit(0))


def row_fingerprint(cols: list[str]) -> Column:
    """C6 fast path: the reference fingerprints rows with
    ``concat_ws("", *cols)`` (Raptor.py:559-568) — O(row width) strings
    and separator-unsafe.  ``xxhash64`` over the columns is fixed-width,
    collision-negligible for diffing, and JVM-native (SURVEY.md §7.3)."""
    return F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols])
