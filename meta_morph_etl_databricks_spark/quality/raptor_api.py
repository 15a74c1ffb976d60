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


# One token per step: quoted literal / quoted identifier / line or block
# comment / possibly-qualified word / any other char.  Literals and
# comments are opaque — their contents are never rewritten.
_SQL_TOKEN = re.compile(
    r"""
    '(?:[^']|'')*'            # string literal ('' = escaped quote)
  | "(?:[^"]|"")*"            # quoted identifier
  | --[^\n]*                  # line comment
  | /\*.*?\*/                 # block comment
  | [A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?   # word or schema.name
  | .                         # punctuation / whitespace, one char
    """,
    re.VERBOSE | re.DOTALL,
)

# Keywords that END a FROM-clause table list (so a comma after them no
# longer re-arms table position — `SELECT a.b, c.d` stays untouched).
_FROM_BREAKERS = frozenset(
    "select where group order having limit on using window union except "
    "intersect qualify set values when then else end case and or not as".split()
)


def _rewrite_qualified_names(spark: SparkSession, sql: str) -> str:
    """Warehouse-SQL portability shim (reference: Raptor.py:95-99,445-453
    strips ``reporting.``-style schema prefixes before running on Spark):
    rewrite ``schema.name`` → ``name`` wherever ``name`` is a registered
    view, ``schema`` is NOT a real database, and the reference sits in
    TABLE position (immediately after FROM/JOIN, or after a comma inside
    a FROM list) — so a query written against the warehouse's qualified
    tables runs against temp views, while string literals, comments,
    alias-qualified column refs (``o.status``), and genuine
    catalog-qualified tables all pass through untouched."""

    def maybe_rewrite(tok: str) -> str:
        schema, name = tok.split(".", 1)
        try:
            if spark.catalog.tableExists(name) and not spark.catalog.databaseExists(schema):
                return name
        except Exception:
            pass
        return tok

    out: list[str] = []
    expect_table = False  # next word is in table position
    in_from_list = False  # a comma re-arms table position
    for m in _SQL_TOKEN.finditer(sql):
        tok = m.group(0)
        if tok[0] in "'\"" or tok.startswith("--") or tok.startswith("/*"):
            out.append(tok)
            continue
        low = tok.lower()
        if low in ("from", "join"):
            expect_table = True
            in_from_list = low == "from"
        elif tok == "," and in_from_list:
            expect_table = True
        elif low in _FROM_BREAKERS:
            expect_table = False
            in_from_list = False
        elif tok[0].isalpha() or tok[0] == "_":
            if expect_table and "." in tok:
                tok = maybe_rewrite(tok)
            if expect_table:
                expect_table = False  # consumed the table ref (alias may follow)
        out.append(tok)
    return "".join(out)


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
