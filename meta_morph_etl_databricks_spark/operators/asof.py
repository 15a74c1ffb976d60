"""As-of (backward) join — the canonical time-series operator Spark has
no native form of (DuckDB/kdb/pandas ``merge_asof`` do).

Each left row is matched to the LATEST right row with
``right_ts <= left_ts`` for the same key.  The naive formulations are
both scale-broken: a range join explodes to O(|L|·|R|) per key before
filtering, and a per-key ``collect`` is driver-bound.  The scalable
shape is union-tag + window fill:

    union(left tagged 1, right tagged 0)
      → window per key ordered by (ts, tag), running last() over ONE
        struct holding the whole right row (ignorenulls)
      → keep left rows: each carries the most recent right ROW

The fill must be a single struct, not per-payload-column last():
independent fills would substitute older rows' values wherever the
latest right row holds a NULL — true as-of semantics (pandas
merge_asof, DuckDB ASOF) carry the latest row wholesale, NULLs
included.  The struct is non-NULL for every right row, so last()
selects the row atomically and its NULL fields survive.

One shuffle + sort per key column set — the same cost as a single
sort-merge join — and AQE's skew handling applies to the window
exchange like any other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Backward as-of join.  ``payload`` are the right columns carried
    onto each left row (NULL when no prior right row exists).  Ties at
    equal timestamps match (right-at-t is visible to left-at-t).

    ``tolerance_seconds`` voids matches older than the window (payload
    and matched_ts become NULL, the left row survives).
    ``matched_ts_col`` names the carried right timestamp (None drops it).

    NULL semantics are equi-join semantics (DuckDB ASOF, pandas
    merge_asof): a right row with a NULL key or NULL timestamp can
    never match and is dropped before the union — otherwise the window
    PARTITION BY would group NULL keys together (SQL grouping treats
    NULLs as equal; join equality does not) and a NULL timestamp would
    sort NULLS FIRST and become the standing "match" for every early
    left row.  NULL-key/NULL-ts LEFT rows survive unmatched (NULLS
    FIRST ordering places a NULL-ts left row before any real right
    row, so its fill is empty by construction).

    Duplicate right rows at one (key, ts) carry exactly one match per
    left row (never a fan-out), but WHICH duplicate is unspecified —
    the window order has no tiebreaker beyond (ts, side), matching
    pandas merge_asof's positional pick.  Deduplicate the right side
    upstream when the choice matters; a payload-based tiebreak is not
    imposed here because payload columns may be unorderable types.
    """
    payload = payload or [c for c in right.columns if c not in {*on, right_ts}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns {sorted(overlap)} collide with left columns")

    rfields = {f.name: f.dataType for f in right.schema.fields}
    row_type = T.StructType(
        [T.StructField("_rts", rfields[right_ts])]
        + [T.StructField(f"_r_{c}", rfields[c]) for c in payload]
    )
    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in {*on, left_ts}],
        F.lit(None).cast(row_type).alias("_rrow"),
    )
    unmatchable = F.col(right_ts).isNull()
    for k in on:
        unmatchable = unmatchable | right[k].isNull()
    rt = right.where(~unmatchable).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in {*on, left_ts}],
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"_r_{c}") for c in payload],
        ).alias("_rrow"),
    )
    # order (ts, side): right (0) sorts before left (1) at equal ts, so
    # an equal-timestamp right row is visible to the left row
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = rt.unionByName(lt).select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_frow")
    )
    out = filled.filter(F.col("_side") == 1)

    fts = F.col("_frow._rts")
    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        age = F.col("_ts").cast("double") - fts.cast("double")
        within = fts.isNotNull() & (age <= float(tolerance_seconds))

    keep = [
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left.columns if c not in {*on, left_ts}],
        *[F.when(within, F.col(f"_frow._r_{c}")).alias(c) for c in payload],
    ]
    if matched_ts_col:
        keep.append(F.when(within, fts).alias(matched_ts_col))
    return out.select(*keep)
