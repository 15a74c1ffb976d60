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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sinks import write_parquet
from .reconcile import ReconcileResult, reconcile

Source = DataFrame | tuple[str, str]


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
        return spark.sql(ref)
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
    with (Raptor.py:270-436): source/target rows, mismatched rows,
    extras both ways, and match_pct in exact basis points.
    """
    keys = [primary_key] if isinstance(primary_key, str) else list(primary_key)
    src_df = _resolve(spark, source)
    tgt_df = _resolve(spark, target)
    res = reconcile(src_df, tgt_df, keys)

    src_rows = src_df.count()
    mismatch_rows = res.cells.select(*keys).distinct().count()
    extra_src = res.extra_source.count()
    extra_tgt = res.extra_target.count()
    matched = max(src_rows - mismatch_rows - extra_src, 0)
    basis = max(src_rows, 1)
    overview = spark.createDataFrame(
        [
            (
                src_rows,
                tgt_df.count(),
                matched,
                mismatch_rows,
                extra_src,
                extra_tgt,
                float(matched * 10000 // basis) / 100.0,
            )
        ],
        "source_rows long, target_rows long, matched_rows long, mismatched_rows long, "
        "extra_source long, extra_target long, match_pct double",
    )
    if output_path:
        write_parquet(res.cells, f"{output_path}/cells")
        write_parquet(res.extra_source, f"{output_path}/extra_source")
        write_parquet(res.extra_target, f"{output_path}/extra_target")
        write_parquet(res.summary, f"{output_path}/summary")
        write_parquet(overview, f"{output_path}/overview")
    return ReconcileReport(result=res, overview=overview)
