"""C6: dataset reconciliation — the Raptor diff engine rebuilt
Spark-first (reference: raptor/Raptor/Raptor.py:490-683).

Reference algorithm: cast-all-to-string + na.fill('') normalization
(:551-557), row fingerprint via ``concat_ws("")`` (:559-568), inner join
on PK where fingerprints differ, then split/transform/explode into
per-column mismatch cells (:575-594) with a column-name lookup through
``element_at(array(lit(...)), idx)`` (:596-605), plus anti-joins for
extras on both sides (:618-644) and a per-column mismatch-% summary
(:440-473).

This rebuild keeps the outputs (cells / extras / summary) but replaces
the mechanics for scale (SURVEY.md §7.3):

- fingerprint = ``xxhash64`` over normalized columns — fixed width,
  separator-safe, JVM codegen; the reference's "" separator corrupts
  if the data contains it and carries O(row-width) strings through the
  shuffle.
- ONE full-outer join on the keys feeds every output: cells (both sides
  present, fingerprints differ → HOF filter + explode), extras (side
  marker NULL → the other side's rows), summary, and the one-row
  overview aggregate.  The reference ran an inner join plus two
  anti-joins — three shuffles of each side; here it is one shuffle per
  side, and every derived frame is a filter over the same exchange
  (AQE reuses it when several outputs run in one action).
- cell extraction only widens MISMATCHED rows; matching rows are
  dropped by the cheap hash comparison first.
- everything is lazy: building a ReconcileResult triggers NO job.  The
  summary's denominator is a broadcast one-row count joined in, not an
  eager driver-side ``count()``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = ""  # reference: na.fill('') — NULL and '' compare equal


def _norm(col: str) -> Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(NULL_SENTINEL))


@dataclass
class ReconcileResult:
    cells: DataFrame          # keys..., column_name, source_value, target_value
    extra_source: DataFrame   # rows only in source
    extra_target: DataFrame   # rows only in target
    summary: DataFrame        # column_name, mismatch_count, mismatch_pct
    overview: DataFrame       # ONE row of counts + match_pct, one aggregate job


def reconcile(source: DataFrame, target: DataFrame, keys: list[str]) -> ReconcileResult:
    """Diff two datasets sharing a primary key.

    Scale behavior: one shuffle of each side on ``keys`` feeds a single
    full-outer join; cells, extras, summary, and overview are all
    filters/aggregates over that joined frame.  The per-cell explode
    happens only on rows whose xxhash64 fingerprints differ, so a
    99.9%-identical 100 TB pair explodes 0.1% of rows.
    """
    compare_cols = [c for c in source.columns if c not in keys]
    missing = [c for c in compare_cols if c not in target.columns]
    if missing:
        raise ValueError(f"target lacks columns {missing}")

    def prep(df: DataFrame, marker: str) -> DataFrame:
        return df.select(
            *keys, *[_norm(c).alias(c) for c in compare_cols]
        ).withColumns(
            {
                "_fp": F.xxhash64(*[F.col(c) for c in compare_cols]),
                marker: F.lit(1),
            }
        )

    joined = (
        prep(source, "_s").alias("s")
        .join(prep(target, "_t").alias("t"), on=keys, how="full_outer")
    )
    in_src, in_tgt = F.col("_s").isNotNull(), F.col("_t").isNotNull()
    differs = F.col("s._fp") != F.col("t._fp")

    cell_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"s.{c}").alias("source_value"),
                F.col(f"t.{c}").alias("target_value"),
            )
            for c in compare_cols
        ]
    )
    cells = (
        joined.filter(in_src & in_tgt & differs)
        .select(*keys, F.explode(F.filter(cell_structs, lambda x: x.source_value != x.target_value)).alias("d"))
        .select(*keys, "d.column_name", "d.source_value", "d.target_value")
    )

    extra_source = joined.filter(~in_tgt).select(*keys, *[F.col(f"s.{c}").alias(c) for c in compare_cols])
    extra_target = joined.filter(~in_src).select(*keys, *[F.col(f"t.{c}").alias(c) for c in compare_cols])

    # Percentage via integer basis points: float division + decimal cast
    # rounds differently across engines at representation boundaries;
    # (count*10000 DIV total)/100 is exact everywhere (truncated to 2dp;
    # the reference rounds a decimal(10,2), Raptor.py:454-461).  The
    # denominator is a broadcast one-row aggregate, NOT an eager count()
    # at plan-build time — nothing runs until the summary is consumed.
    denom = F.broadcast(source.agg(F.greatest(F.count(F.lit(1)), F.lit(1)).alias("_src_n")))
    summary = (
        cells.groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("mismatch_count"))
        .crossJoin(denom)
        .withColumn(
            "mismatch_pct",
            F.expr("CAST(mismatch_count * 10000 DIV _src_n AS DOUBLE) / 100.0"),
        )
        .drop("_src_n")
    )

    # One aggregate job over the same joined frame gives every count the
    # reference's email overview leads with (Raptor.py:270-436).
    both = in_src & in_tgt
    n = lambda cond, name: F.sum(F.when(cond, 1).otherwise(0)).alias(name)  # noqa: E731
    overview = (
        joined.agg(
            n(in_src, "source_rows"),
            n(in_tgt, "target_rows"),
            n(both & ~differs, "matched_rows"),
            n(both & differs, "mismatched_rows"),
            n(~in_tgt, "extra_source"),
            n(~in_src, "extra_target"),
        )
        .withColumn(
            "match_pct",
            F.expr("CAST(matched_rows * 10000 DIV GREATEST(source_rows, 1) AS DOUBLE) / 100.0"),
        )
    )
    return ReconcileResult(cells, extra_source, extra_target, summary, overview)
