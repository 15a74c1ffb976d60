"""Stream-stream joins with watermark-bounded state — the streaming
counterpart of the batch attribution joins (operators/rangejoin.py,
operators/asof.py).

A stream-stream equi join must buffer both sides; without bounds that
state grows forever.  Spark evicts buffered rows when BOTH
  - each side carries a watermark, and
  - the join condition constrains the two event times to a bounded
    interval,
so the builders here always attach both.  State per executor is then
O(rows per watermark horizon), the only shape that survives an
unbounded feed.

Batch parity (the repo-wide streaming design rule): ``withWatermark``
is a no-op on batch frames and the join condition is plain column
algebra, so the SAME builder runs in batch mode, where the plain join
is the oracle — tests/test_streaming.py drives both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``on`` where ``right_ts`` falls in
    ``[left_ts, left_ts + horizon]`` — the attribution-window shape.

    ``left_ts``/``right_ts`` must be DISTINCT column names (rename
    before calling); all non-key columns must be disjoint so the output
    needs no aliasing.  ``how`` may be ``inner`` or ``leftOuter`` (the
    streaming-supported outer: unmatched left rows emit once their
    watermark passes — in batch mode, immediately).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"stream-stream interval join supports inner/leftOuter, got {how!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, found {sorted(overlap)}")
    if "_r_key" in left.columns or "_r_key" in right.columns:
        raise ValueError("column name _r_key is reserved by interval_join_streams")
    lw = left.withWatermark(left_ts, watermark)
    # rename the right key before joining: when both sides derive from
    # the same source, drop(rw[on]) can resolve to the LEFT attribute
    # after lineage dedup — a leftOuter row then surfaces the right's
    # NULL key instead of the left's real one.  A distinct name keeps
    # the drop unambiguous and the left key authoritative.
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(on, "_r_key")
    cond = (
        (lw[on] == rw["_r_key"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, how).drop("_r_key")


def clicks_to_purchases_stream(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Attribution over the events feed: each click paired with the same
    user's purchases inside the ``horizon`` after it (the streaming form
    of ``q_range_attribution``'s window).  Returns
    (user_id, click_id, click_ts, purchase_id, purchase_ts, amount)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return interval_join_streams(
        clicks,
        purchases,
        on="user_id",
        left_ts="click_ts",
        right_ts="purchase_ts",
        horizon=horizon,
        watermark=watermark,
        how=how,
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live stream (the Databricks bronze→silver step; the reference does
    the same join batch-side in every mart, e.g. orders→customer).

    Stream-static joins need NO state or watermark — Spark re-plans the
    static side per micro-batch, so a broadcast-sized dim costs one
    broadcast per batch and the stream side never buffers.  The static
    side is explicitly broadcast: at 100 TB/day of stream the dim join
    must never become a per-batch shuffle.  The same call works in
    batch mode (broadcast hash join), which is the test oracle.

    ``how`` is restricted to the stream-preserving joins ('inner',
    'left'): right/full would need the full stream history against the
    static side, which streaming cannot express.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"enrich_stream supports inner/left, got {how!r}")
    return stream.join(F.broadcast(dim), on, how)
