"""Time-window aggregations over events — tumbling, sliding, session.

Each builder takes ANY events DataFrame (batch or streaming) and
returns the windowed aggregate; mode is decided by the caller.  In
streaming mode, add a watermark first (:func:`with_watermark`) so state
for closed windows is dropped and late data beyond the bound is
discarded — unbounded state is the failure mode at 100 TB/day event
volumes.

Aggregates here are all algebraic (count/sum/min/max) so Spark computes
them with partial (map-side) aggregation in batch mode and incremental
state updates in streaming mode — no buffering of raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, delay: str = "2 hours", ts_col: str = "ts") -> DataFrame:
    """Late-data bound: events later than max(event time) - delay are
    dropped; window state older than the bound is finalized + freed."""
    return events.withWatermark(ts_col, delay)


def _flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    """window struct → (window_start, window_end) timestamps; struct
    columns don't survive a parquet-oracle comparison, timestamps do."""
    return df.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *[c for c in df.columns if c != window_col],
    ).drop(window_col)


def tumbling_type_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window event rollup per event_type: count + value sum.

    Streaming state per window/type pair is one (count, sum) — O(types)
    per window, independent of event volume.
    """
    agg = (
        # explicit NULL-event-time drop: window() discards NULL ts rows
        # anyway (no window can be derived), but relying on that
        # implicitly hides a silent row drop from readers and from any
        # future Spark that NULL-groups instead — same contract as the
        # oracle's WHERE ts IS NOT NULL.
        events.where(F.col("ts").isNotNull())
        .groupBy(F.window("ts", width).alias("window"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    return _flatten_window(agg)


def sliding_type_activity(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour", exact_users: bool = False
) -> DataFrame:
    """Sliding-window activity per event_type: each event lands in
    width/slide overlapping windows; distinct-user load is tracked with
    approx_count_distinct (HLL — mergeable sketch, streaming-safe,
    unlike exact COUNT DISTINCT which would buffer all user ids).

    ``exact_users=True`` switches to exact COUNT DISTINCT — the batch /
    oracle-checkable path (HLL estimates differ across engines).
    """
    users = (
        F.count_distinct(F.col("user_id")) if exact_users else F.approx_count_distinct("user_id")
    )
    agg = (
        events.where(F.col("ts").isNotNull())  # see tumbling_type_counts
        .groupBy(F.window("ts", width, slide).alias("window"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            users.alias("n_users"),
        )
    )
    return _flatten_window(agg)


def session_user_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity (window end = last event + gap).  Session windows are
    THE canonical stateful-streaming operator Spark ships natively —
    state merges adjacent sessions as events arrive."""
    agg = (
        events.where(F.col("ts").isNotNull())  # see tumbling_type_counts
        .groupBy(F.session_window("ts", gap).alias("session_window"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )
    return agg.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
        "session_value",
    )
