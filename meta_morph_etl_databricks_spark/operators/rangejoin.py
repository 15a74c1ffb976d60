"""Range (interval) join — match left VALUES to right INTERVALS
containing them.

Spark plans a raw ``l.v BETWEEN r.s AND r.e`` join as
BroadcastNestedLoop (O(|L|·|R|) comparisons) unless the right side is
tiny.  The scale shape is bucketization: left rows key to
floor(value / width); right intervals explode to every bucket they
overlap; the join becomes an equi-join on (keys, bucket) with the exact
range predicate as a residual filter.

Each left row lives in exactly ONE bucket, so a right interval — even
one exploded across many buckets — can meet a given left row only once:
no duplicate results, no distinct pass.  Interval rows replicate by
ceil(span / width): pick ``bucket_width`` near the typical span so
replication stays ~1-2×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | None = None,
    how: str = "inner",
    end_inclusive: bool = False,
) -> DataFrame:
    """Join left rows (point ``value_col``) to right rows (interval
    [``start_col``, ``end_col``], end-exclusive unless
    ``end_inclusive``).  Columns must be integral (cast timestamps to
    unix_micros first — exact, unlike double epoch seconds).  ``on``
    adds equi-key columns (e.g. user_id) to the bucket key.
    """
    if how != "inner":
        # The residual range predicate is applied as a post-join filter,
        # which would silently drop NULL-extended rows of any outer join
        # (outer collapses to inner).  Refuse rather than return wrong
        # results; outer-range semantics need the predicate inside the
        # join condition, which forfeits the bucketed equi-join plan.
        raise ValueError(f"range_join supports how='inner' only, got {how!r}")
    on = on or []
    lv, rs, re_ = F.col(value_col), F.col(start_col), F.col(end_col)
    lb = left.withColumn("_bucket", F.floor(lv / bucket_width).cast("long"))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(rs / bucket_width).cast("long"),
                F.floor(re_ / bucket_width).cast("long"),
            )
        ),
    )
    in_range: Column = (lv >= rs) & ((lv <= re_) if end_inclusive else (lv < re_))
    return lb.join(rb, [*on, "_bucket"], how).filter(in_range).drop("_bucket")
