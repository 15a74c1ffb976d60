"""The daily pipeline, end to end — the reference's Airflow DAG
(meta_morph_etl.py:27-73) as ONE composable function:

    ingest (dup-gate → raw overwrite + day-partitioned history, C3/C4)
      → four marts (day-stamped, gated, idempotent day-partition writes)
      → customer_metrics MERGE upsert into the current table (C5)
      → per-day publish hand-off to the reporting layer (C7)

Differences from the reference, on purpose (SURVEY.md §7.1):
- one SparkSession for the whole run, stages hand DataFrames (or
  parquet paths) to each other instead of round-tripping Postgres;
- history/mart appends use DYNAMIC PARTITION OVERWRITE on day_dt, so a
  re-run of the same day is idempotent (the reference instead relies on
  dup gates to explode on double-loads — its Postgres MERGE gave it
  transactional cover we don't have on plain parquet);
- the cross-pipeline dependency (customer_sales_report reading the same
  day's supplier_performance, §3.1 step 4) is an in-memory DataFrame
  hand-off, visible to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..quality.dup_gate import assert_unique
from ..sources.scans import read_parquet_table
from ..sources.sinks import merge_upsert, publish_partition, write_parquet
from . import marts

INGEST_TABLES = ("region", "nation", "supplier", "part", "customer", "orders", "lineitem")

# Declared PKs double as test oracles (reference utils.py:88-119 +
# SURVEY.md §5.1).  lineitem is deliberately absent: the testdata's
# (l_orderkey, l_linenumber) is NOT unique (FIXTURES.md quirk).
INGEST_PKS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey"],
}

MART_PKS: dict[str, list[str]] = {
    "supplier_performance": ["supplier_id"],
    "product_performance": ["product_id"],
    "customer_metrics": ["customer_id"],
    # customer_sales_report is line-grain: sale_id repeats per line, no PK gate
}

MART_FNS = {
    "supplier_performance": marts.supplier_performance,
    "product_performance": marts.product_performance,
    "customer_metrics": marts.customer_metrics,
    "customer_sales_report": marts.customer_sales_report,
}


def _write_day_partition(df: DataFrame, path: str, day: str) -> DataFrame:
    """Idempotent day write: dynamic partition overwrite replaces ONLY
    this day's partition; other history days are untouched."""
    stamped = df.withColumn("day_dt", F.to_date(F.lit(day)))
    (
        stamped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day_dt")
        .parquet(path)
    )
    return stamped


def ingest(spark: SparkSession, source_dir: str, base_dir: str, day: str) -> dict[str, int]:
    """C3+C4 per source entity: dup-gate on the declared PK, overwrite
    the raw snapshot, day-partition the history layer."""
    counts: dict[str, int] = {}
    for name in INGEST_TABLES:
        df = read_parquet_table(spark, source_dir, name)
        if name in INGEST_PKS:
            assert_unique(df, INGEST_PKS[name])
        df.persist()
        try:
            write_parquet(df, f"{base_dir}/raw/{name}.parquet", mode="overwrite")
            _write_day_partition(df, f"{base_dir}/history/{name}", day)
            counts[name] = df.count()
        finally:
            df.unpersist()
    return counts


def run_daily(
    spark: SparkSession,
    source_dir: str,
    base_dir: str,
    day: str = marts.AS_OF,
    publish: bool = True,
) -> dict[str, int]:
    """Run the full daily pipeline; returns per-stage row counts.

    Layout under ``base_dir``: raw/ (snapshot), history/ (day
    partitions), marts/ (day partitions), current/ (upsert target),
    reporting/ (published slices).
    """
    stats = dict(ingest(spark, source_dir, base_dir, day))
    raw_dir = f"{base_dir}/raw"

    for name, fn in MART_FNS.items():
        out = fn(spark, raw_dir)
        if name in MART_PKS:
            assert_unique(out, MART_PKS[name])
        mart_path = f"{base_dir}/marts/{name}"
        _write_day_partition(out, mart_path, day)
        stats[f"mart.{name}"] = spark.read.parquet(mart_path).filter(
            F.col("day_dt") == F.to_date(F.lit(day))
        ).count()
        if publish:
            stats[f"published.{name}"] = publish_partition(
                spark, mart_path, f"{base_dir}/reporting/{name}", day
            )

    # C5: the customer_metrics "current" table is a keyed MERGE target —
    # matched customers take the new day's values, new customers insert,
    # unmatched old customers survive (reference utils.py:368-433).
    current = merge_upsert(
        spark,
        f"{base_dir}/current/customer_metrics",
        MART_FNS["customer_metrics"](spark, raw_dir),
        keys=["customer_id"],
    )
    stats["current.customer_metrics"] = current.count()
    # release the snapshot cache merge_upsert materialized under its
    # lock — a daily driver loop must not pin one target copy per day
    current.unpersist()
    return stats
