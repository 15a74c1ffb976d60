"""Custom stateful streaming operator via ``applyInPandasWithState``.

For semantics the built-in windowed aggregates can't express — here a
per-user lifetime running total with event-count watermarking — Spark's
escape hatch is arbitrary stateful processing: state is an explicit
per-key tuple the operator reads/updates per micro-batch, Arrow-batched
(no per-row Python overhead).

State size is O(keys), not O(events) — the operator must keep bounded
state or set a timeout; this one stores exactly three numbers per user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals: emits the updated lifetime
    (count, sum, max) for every user seen in each micro-batch.  Use
    outputMode('update') downstream."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------- TTL-evicted variant
_UNIT_MS = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}


def _interval_ms(interval: str) -> int:
    """'30 minutes' → 1_800_000.  Same interval grammar the window
    builders accept, limited to a single count+unit term."""
    count, unit = interval.strip().split()
    unit = unit.rstrip("s")
    if unit not in _UNIT_MS:
        raise ValueError(f"unsupported interval unit {unit!r} in {interval!r}")
    return int(count) * _UNIT_MS[unit]


EVICTED_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("last_event_ms", LongType()),
    ]
)

_TTL_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("last_ms", LongType()),
    ]
)


def _make_ttl_updater(ttl_ms: int):
    def _update(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # TTL fired: watermark passed last_event + ttl with no new
            # events — emit the finalized totals ONCE and free the state
            # (this removal is what keeps state O(active keys), not
            # O(keys ever seen))
            n, total, mx, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [None if mx == float("-inf") else mx],
                    "last_event_ms": [last_ms],
                }
            )
            return
        n, total, mx, last_ms = state.get if state.exists else (0, 0.0, float("-inf"), 0)
        for pdf in batches:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).max()
            last_ms = max(last_ms, int(ts_ms))
        state.update((n, total, mx, last_ms))
        # event-time TTL: evict when the watermark passes the last event
        # by the ttl.  A late burst can leave last+ttl at or below the
        # current watermark, which EventTimeTimeout rejects — clamp just
        # past the watermark so the state still dies promptly.
        state.setTimeoutTimestamp(max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1))

    return _update


def expiring_user_totals(events: DataFrame, ttl: str = "30 minutes", watermark: str = "1 minute") -> DataFrame:
    """Per-user totals with event-time TTL eviction: nothing is emitted
    while a user is active; once the watermark passes their last event
    by ``ttl``, the finalized (count, sum, max, last-seen) row emits
    exactly once and the user's state is REMOVED.  The inactivity-
    session shape — and the state-lifecycle discipline the watermarked
    modules enforce, applied to arbitrary state: timeout registered
    every update, eviction frees the key.  Use outputMode('append')."""
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ttl_updater(_interval_ms(ttl)),
            outputStructType=EVICTED_TOTALS_SCHEMA,
            stateStructType=_TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
