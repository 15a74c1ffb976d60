"""Sequence packing: assemble variable-length documents into
fixed-token-budget training samples — the batch-construction step of an
LLM data pipeline (padding waste shrinks from ~50% to a few percent).

Exact first-fit bin packing is inherently sequential, so at corpus
scale every production packer shards the stream and packs each shard
independently; bins never cross shards, so shards are embarrassingly
parallel.  This module implements the deterministic variant of that:
shards are FIXED id ranges (``id DIV shard_span``), within a shard
documents pack in id order by the running token count, and a document
joins the bin its FIRST token falls in ("start-fit") — so a bin can
overflow by at most one document's tokens, the standard
streaming-packer contract (the trainer truncates or wraps the tail).

Everything is window arithmetic over one hash-partitioned sort — no
UDF, no driver loop, and the output is invariant to parallelism because
shard boundaries are data-derived, not partition-derived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_span: int = 100_000,
) -> DataFrame:
    """Assign every document to a pack (training sample) of roughly
    ``budget_tokens`` whitespace tokens.

    Returns (id_col, n_tokens, shard, pack_in_shard, pack_id) with
    ``pack_id`` globally unique and stable: shard * 2^32 + pack index.
    The pack INDEX within a shard is bounded by the shard's token mass
    over the budget (NOT by shard_span — long documents mean far more
    packs than documents), so the composite uses a fixed 2^32 stride: a
    collision would need one shard to exceed 2^32 packs ≈ budget·2^32
    tokens (8.8e12 at budget 2048), and the id stays in a signed long
    for shards < 2^30.  Reruns and different cluster sizes produce
    identical assignments, which matters for resumable preprocessing
    jobs.

    Scale shape: ONE shuffle (hash on shard for the window sort); each
    shard's window is independent, so parallelism = number of live
    shards.  Pick ``shard_span`` so one shard's rows sort comfortably
    in an executor core (1e5 docs ≈ tens of MB of (id, count) pairs).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    n_tok: Column = F.size(tokens(text_col))
    # FLOOR division, not cast-truncation: negative ids must shard the
    # same way as the oracle's `//` (floor) — trunc rounds toward zero
    shard = F.floor(F.col(id_col) / shard_span).cast("bigint")
    sized = docs.select(
        F.col(id_col), n_tok.cast("bigint").alias("n_tokens"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    tokens_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    pack_in_shard = F.floor(tokens_before / budget_tokens)
    return sized.select(
        id_col,
        "n_tokens",
        "shard",
        pack_in_shard.alias("pack_in_shard"),
        # fixed 2^32 stride, NOT shard_span: pack count per shard is
        # bounded by token mass / budget, which shard_span does not cap.
        # Guarded: |shard| >= 2^31 would silently wrap the signed-long
        # composite (e.g. 60-bit hash-family ids with a small span) —
        # raise instead of corrupting ids; callers with such ids pick a
        # larger shard_span.
        F.when(
            F.abs(F.col("shard")) < F.lit(1 << 31),
            F.col("shard") * F.lit(1 << 32) + pack_in_shard,
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pack_sequences: shard "),
                    F.col("shard").cast("string"),
                    F.lit(f" out of the +/-2^31 id-composite range; raise shard_span (= {shard_span})"),
                )
            )
        )
        .alias("pack_id"),
    )


def pack_rollup(packed: DataFrame) -> DataFrame:
    """Per-pack summary of a :func:`pack_sequences` result: document
    count and token total — the sanity surface (every pack's total sits
    in [budget, budget + max_doc_tokens) except each shard's tail)."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into overlapping token windows — the
    complement of :func:`pack_sequences` (packing assembles SHORT docs
    up to the budget; chunking cuts LONG docs down to it).

    Window starts step by ``stride = chunk_tokens − overlap``: chunk i
    covers tokens [i·stride, i·stride + chunk_tokens).  Every start
    < n_tokens emits (the tail window is partial; with overlap > 0 a
    tail shorter than ``overlap`` repeats only already-seen tokens —
    the standard sliding-window contract, kept for determinism).
    Zero-token documents emit nothing.

    Returns (id_col, chunk_idx, n_tokens, chunk_text).  Map-only: one
    tokenize per document, starts from ``sequence``, windows from
    ``slice`` — no shuffle, no UDF; parallelism is the scan's.
    """
    from .text import tokens

    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    toked = docs.select(id_col, tokens(text_col).alias("_t")).where(F.size("_t") > 0)
    exploded = toked.select(
        id_col,
        "_t",
        F.posexplode(
            F.sequence(F.lit(0), F.size("_t") - 1, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    )
    window = F.slice("_t", F.col("_start") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(window).alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
