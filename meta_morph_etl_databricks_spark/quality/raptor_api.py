"""The Raptor request API — the reference's programmatic entry point
(``submit_raptor_request``, raptor/Raptor/Raptor.py:490-683) rebuilt on
the reconcile engine.

Reference flow: route source/target by type (JDBC pushdown query or
GCS-parquet + temp-view SQL, Raptor.py:88-137), diff on a primary key,
persist mismatch cells + extras to dated outputs, and build a summary
report (match %, per-column mismatch rates).  The SMTP/HTML email layer
is out of engine scope — the summary IS a DataFrame here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sinks import write_parquet
from .reconcile import ReconcileResult, reconcile

Source = DataFrame | tuple[str, str]


def _rewrite_qualified_names(spark: SparkSession, sql: str) -> str:
    """Warehouse-SQL portability shim (reference: Raptor.py:95-99,445-453
    strips ``reporting.``-style schema prefixes before running on Spark):
    rewrite ``schema.name`` → ``name`` wherever ``name`` is a registered
    view and ``schema`` is NOT a real database — so a query written
    against the warehouse's qualified tables runs against temp views,
    while genuine catalog-qualified tables and column refs like
    ``alias.col`` (whose bare name is no view) pass through untouched."""

    def repl(m: re.Match[str]) -> str:
        schema, name = m.group(1), m.group(2)
        try:
            if spark.catalog.tableExists(name) and not spark.catalog.databaseExists(schema):
                return name
        except Exception:
            pass
        return m.group(0)

    return re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", repl, sql)


def _resolve(spark: SparkSession, src: Source) -> DataFrame:
    """Route a request input to a DataFrame:
    ('parquet', path) | ('sql', query-over-registered-views) |
    ('jdbc', 'url|query') | a DataFrame passthrough."""
    if isinstance(src, DataFrame):
        return src
    kind, ref = src
    if kind == "parquet":
        return spark.read.parquet(ref)
    if kind == "sql":
        return spark.sql(_rewrite_qualified_names(spark, ref))
    if kind == "jdbc":
        url, query = ref.split("|", 1)
        return spark.read.format("jdbc").option("url", url).option("query", query).load()
    raise ValueError(f"unknown source type {kind!r} (parquet|sql|jdbc or a DataFrame)")


@dataclass
class ReconcileReport:
    result: ReconcileResult
    overview: DataFrame  # one row: counts + match percentage


def submit_reconcile_request(
    spark: SparkSession,
    source: Source,
    target: Source,
    primary_key: list[str] | str,
    output_path: str | None = None,
) -> ReconcileReport:
    """Diff ``source`` against ``target`` on ``primary_key``.

    Outputs mirror the reference's work tables: if ``output_path`` is
    given, cells/extras/summary land under it as parquet (Raptor writes
    ``gs://raptor-workflow/{today}/{loc}``, Raptor.py:103-108 — dating
    the path is the caller's naming choice here).

    The overview row carries the counts the reference's email leads
    with (Raptor.py:270-436): source/target rows, matched/mismatched
    rows, extras both ways, and match_pct in exact basis points.  It is
    ONE aggregate job over the reconcile join (the reference ran ~6
    separate count actions, each rescanning both sides, Raptor.py:544-545
    notwithstanding); when ``output_path`` is set, the source/target
    inputs are persisted across the four derived writes.
    """
    keys = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    src_df = _resolve(spark, source)
    tgt_df = _resolve(spark, target)
    res = reconcile(src_df, tgt_df, keys)
    overview = res.overview
    if output_path:
        src_df.persist()
        tgt_df.persist()
        try:
            write_parquet(res.cells, f"{output_path}/cells")
            write_parquet(res.extra_source, f"{output_path}/extra_source")
            write_parquet(res.extra_target, f"{output_path}/extra_target")
            write_parquet(res.summary, f"{output_path}/summary")
            write_parquet(overview, f"{output_path}/overview")
        finally:
            src_df.unpersist()
            tgt_df.unpersist()
    return ReconcileReport(result=res, overview=overview)
