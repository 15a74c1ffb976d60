"""Declared queries for the quality layer (C3/C6): the reconciliation
engine diffing ``orders`` against a deterministically perturbed copy —
the same source-vs-target comparison Raptor runs between prod and dev
marts (raptor_task.py:18-34), expressible in SQL for the oracle.

Perturbation (pure functions of the key, so both engines agree):
  - rows with o_orderkey % 101 == 0 exist only in SOURCE (target-missing)
  - rows with o_orderkey % 103 == 0 exist only in TARGET (source-missing)
  - o_totalprice +1.00 where o_orderkey % 97 == 0  (numeric drift)
  - o_orderstatus → 'XX' where o_orderkey % 89 == 0 (categorical drift)

Money is normalized to decimal(18,2) BEFORE stringification — raw
double→string formatting is engine-specific; decimal strings are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..quality.reconcile import reconcile
from ..sources.scans import read_parquet_table
from .registry import register

_SRC_SQL = """
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % 101 <> 0
"""

_TGT_SQL = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 97 = 0
                THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1
                ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS o_totalprice,
           CASE WHEN o_orderkey % 89 = 0 THEN 'XX' ELSE o_orderstatus END AS o_orderstatus
    FROM orders WHERE o_orderkey % 103 <> 0
"""


def _frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = read_parquet_table(spark, sf_dir, "orders")
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    source = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey", "o_custkey", dec_price.alias("o_totalprice"), "o_orderstatus"
    )
    target = orders.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 97 == 0, dec_price + 1).otherwise(dec_price).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("XX")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
    )
    return source, target


_CELLS_ORACLE = f"""
WITH src AS ({_SRC_SQL}), tgt AS ({_TGT_SQL}),
j AS (
    SELECT s.o_orderkey,
           CAST(s.o_custkey AS VARCHAR) AS sc, CAST(t.o_custkey AS VARCHAR) AS tc,
           CAST(s.o_totalprice AS VARCHAR) AS sp, CAST(t.o_totalprice AS VARCHAR) AS tp,
           s.o_orderstatus AS ss, t.o_orderstatus AS ts
    FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey
)
SELECT o_orderkey, 'o_custkey' AS column_name, sc AS source_value, tc AS target_value
FROM j WHERE sc <> tc
UNION ALL
SELECT o_orderkey, 'o_totalprice', sp, tp FROM j WHERE sp <> tp
UNION ALL
SELECT o_orderkey, 'o_orderstatus', ss, ts FROM j WHERE ss <> ts
"""


@register("q_reconcile_cells", _CELLS_ORACLE)
def q_reconcile_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 cell-level diff: (pk, column_name, source_value, target_value)
    for every differing cell (Raptor.py:575-605 rebuilt as
    hash-prefilter + struct-array explode)."""
    source, target = _frames(spark, sf_dir)
    return reconcile(source, target, ["o_orderkey"]).cells


_EXTRAS_ORACLE = f"""
WITH src AS ({_SRC_SQL}), tgt AS ({_TGT_SQL})
SELECT 'source_only' AS side, o_orderkey FROM src
WHERE NOT EXISTS (SELECT 1 FROM tgt WHERE tgt.o_orderkey = src.o_orderkey)
UNION ALL
SELECT 'target_only' AS side, o_orderkey FROM tgt
WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = tgt.o_orderkey)
"""


@register("q_reconcile_extras", _EXTRAS_ORACLE)
def q_reconcile_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 extras: rows present on one side only (Raptor.py:618-644,
    native left_anti both directions)."""
    source, target = _frames(spark, sf_dir)
    r = reconcile(source, target, ["o_orderkey"])
    tag = lambda df, t: df.select(F.lit(t).alias("side"), "o_orderkey")  # noqa: E731
    return tag(r.extra_source, "source_only").unionByName(tag(r.extra_target, "target_only"))


_SUMMARY_ORACLE = f"""
WITH src AS ({_SRC_SQL}),
cells AS ({_CELLS_ORACLE})
SELECT column_name, COUNT(*) AS mismatch_count,
       (COUNT(*) * 10000 // (SELECT COUNT(*) FROM src)) / 100.0 AS mismatch_pct
FROM cells GROUP BY column_name
"""


@register("q_reconcile_summary", _SUMMARY_ORACLE)
def q_reconcile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 per-column mismatch summary (Raptor.py:440-473)."""
    source, target = _frames(spark, sf_dir)
    return reconcile(source, target, ["o_orderkey"]).summary
