"""Streaming deduplication — the streaming half of the dedup layer
(operators/dedup.py is the batch half).

Two shapes, both state-bounded (unbounded dedup state is the failure
mode at 100 TB/day):

- :func:`dedup_stream` — exact key dedup WITHIN the watermark horizon
  via ``dropDuplicatesWithinWatermark``: state for a key is dropped once
  the watermark passes its event time, so memory is O(keys per horizon),
  not O(keys ever seen).  The right tool for at-least-once sources
  (Kafka redelivery, file re-lands) where duplicates arrive close
  together in event time.
- :func:`dedup_stream_exact` — plain ``dropDuplicates`` for bounded
  backfills (``availableNow`` runs) where the key universe fits state
  and cross-horizon duplicates matter.  Documented hazard: on an
  unbounded stream this state never ages out — prefer
  :func:`dedup_stream`.

Batch parity: both builders accept a batch DataFrame too (Spark routes
``dropDuplicatesWithinWatermark`` to plain ``dropDuplicates`` semantics
per-key in batch... it is streaming-only, so the batch path uses
``dropDuplicates`` explicitly), keeping the builder testable both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact dedup on ``keys`` with watermark-bounded state.

    A duplicate arriving within ``watermark_delay`` of the first-seen
    record (in event time) is dropped; one arriving after the state for
    its key was evicted passes through — the standard horizon-bounded
    exactly-once-per-horizon contract.  In batch mode (non-streaming
    input) this is plain ``dropDuplicates`` — same keys, whole-input
    horizon.
    """
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)


def dedup_stream_exact(events: DataFrame, keys: list[str]) -> DataFrame:
    """Unbounded-state exact dedup — ONLY for bounded runs (backfills
    with ``trigger(availableNow=True)``).  State grows with the distinct
    key count and never ages out; use :func:`dedup_stream` for
    continuous pipelines."""
    return events.dropDuplicates(keys)
