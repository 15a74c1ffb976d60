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
# comment / possibly-qualified word (up to 3 dotted parts, so
# ``schema.table.col`` is one token) / any other char.  Literals and
# comments are opaque — their contents are never rewritten.
_SQL_TOKEN = re.compile(
    r"""
    '(?:[^']|'')*'            # string literal ('' = escaped quote)
  | "(?:[^"]|"")*"            # quoted identifier
  | --[^\n]*                  # line comment
  | /\*.*?\*/                 # block comment
  | [A-Za-z_]\w*(?:\.[A-Za-z_]\w*){0,2}   # word / schema.name / schema.tbl.col
  | .                         # punctuation / whitespace, one char
    """,
    re.VERBOSE | re.DOTALL,
)

# Keywords that END a FROM-clause table list at their own nesting depth
# (so a comma after them no longer re-arms table position — `SELECT
# a.b, c.d` stays untouched).  Deliberately NOT included: AS and alias
# words (an aliased table keeps the list open: `FROM s.a AS x, s.b`),
# and ON/USING (comma-joins may continue after a join condition).
_FROM_BREAKERS = frozenset(
    "select where group order having limit window union except "
    "intersect qualify set values".split()
)


def _rewrite_qualified_names(spark: SparkSession, sql: str) -> str:
    """Warehouse-SQL portability shim (reference: Raptor.py:95-99,445-453
    strips ``reporting.``-style schema prefixes before running on Spark):
    rewrite ``schema.name`` → ``name`` wherever ``name`` is a registered
    view, ``schema`` is NOT a real database, and the reference sits in
    TABLE position (immediately after FROM/JOIN, or after a comma inside
    a FROM list); 3-part ``schema.table.col`` column refs are stripped
    in ANY position (they can only mean a qualified column).  String
    literals, comments, 2-part alias/column refs (``o.status``), and
    genuine catalog-qualified tables pass through untouched.

    Table-position state is tracked PER PAREN DEPTH, so a subquery's
    SELECT cannot disarm the outer FROM list, and ``extract(day FROM
    ts)`` arming inside a function call dies with its closing paren.
    """

    def _view_for(schema: str, name: str) -> bool:
        try:
            return spark.catalog.tableExists(name) and not spark.catalog.databaseExists(schema)
        except Exception:
            return False

    def maybe_rewrite(tok: str) -> str:
        parts = tok.split(".")
        if len(parts) == 2 and _view_for(*parts):
            return parts[1]
        return tok

    out: list[str] = []
    # per-depth (expect_table, in_from_list); index = paren nesting depth
    stack: list[list[bool]] = [[False, False]]
    for m in _SQL_TOKEN.finditer(sql):
        tok = m.group(0)
        if tok[0] in "'\"" or tok.startswith("--") or tok.startswith("/*"):
            out.append(tok)
            continue
        if tok == "(":
            stack.append([False, False])
            out.append(tok)
            continue
        if tok == ")":
            if len(stack) > 1:
                stack.pop()
            out.append(tok)
            continue
        state = stack[-1]
        low = tok.lower()
        if low in ("from", "join"):
            state[0] = True
            if low == "from":
                state[1] = True
        elif tok == "," and state[1]:
            state[0] = True
        elif low in _FROM_BREAKERS:
            state[0] = False
            state[1] = False
        elif tok[0].isalpha() or tok[0] == "_":
            parts = tok.split(".")
            if len(parts) == 3 and _view_for(parts[0], parts[1]):
                tok = ".".join(parts[1:])  # schema.table.col → table.col
            elif state[0] and "." in tok:
                tok = maybe_rewrite(tok)
            if state[0]:
                state[0] = False  # consumed the table ref (alias may follow)
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
