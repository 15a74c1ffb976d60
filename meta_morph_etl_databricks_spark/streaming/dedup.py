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


def stream_incremental_dedup(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    est_threshold: float = 0.8,
    trigger_available_now: bool = True,
):
    """Continuous corpus curation: every micro-batch of documents is
    near-dup-deduped against the persisted MinHash band index
    (operators/incremental.py) — accepted docs append to
    ``accepted_path``, the batch's band rows append to ``index_path``,
    and the next micro-batch dedups against the grown index.  The
    streaming form of the daily-increment shape: the corpus is indexed
    exactly once, each batch pays O(batch).

    Ordering/delivery contract (same honesty as the batch module):

    - ids must be monotone-ish across batches for the drop-higher-id
      policy to mean "first seen wins" (event-time ids, sequence ids);
    - a doc id already present in the INDEX is dropped before
      processing — cross-batch redelivery of the same document is a
      no-op (sub-shingle docs have no index rows and re-accept on
      redelivery; give them ids and dedupe downstream or gate them out);
    - the index append is the LAST write per batch, so index presence
      marks a fully-committed batch.  A crash between the accepted and
      index appends replays the whole batch: the recomputed accepted
      set is identical (the index it dedups against is unchanged), so
      ``accepted_path`` is at-least-once with FULL-ROW duplicates under
      crash-replay — read it with dropDuplicates([id]) or point the
      accepted sink at merge_upsert for exactly-once at rewrite cost.
    """
    from pyspark.sql import functions as F

    from ..operators.incremental import incremental_dedup, minhash_band_index
    from ..sources.sinks import path_exists

    idx_schema = minhash_band_index(
        stream.sparkSession.createDataFrame([], stream.schema),
        text_col,
        id_col,
        num_hashes,
        bands,
    ).schema

    def dedupe_batch(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        if path_exists(spark, index_path):
            index = spark.read.schema(idx_schema).parquet(index_path)
        else:
            index = spark.createDataFrame([], idx_schema)
        seen = index.select(F.col(id_col)).distinct()
        fresh = batch_df.join(seen, id_col, "left_anti")
        if fresh.isEmpty():
            return
        res = incremental_dedup(
            fresh, index, text_col, id_col, num_hashes, bands, est_threshold
        )
        # index_rows is the shared subtree of BOTH writes (accepted's
        # anti-join derives from it): persist it across the two actions
        # so the increment's shingle→signature chain runs once per
        # batch, not twice; freed immediately — a long-running stream
        # must not accumulate one cache per micro-batch.
        rows = res.index_rows.persist()
        try:
            res.accepted.write.mode("append").parquet(accepted_path)
            rows.write.mode("append").parquet(index_path)  # commit marker
        finally:
            rows.unpersist()

    writer = stream.writeStream.foreachBatch(dedupe_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
