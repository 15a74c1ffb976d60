from .bucketing import quantile_buckets
from .components import connected_components, dedup_by_components
from .incremental import (
    embedding_bucket_index,
    fingerprint_index,
    incremental_dedup,
    incremental_embed_near_dup,
    incremental_exact_dedup,
    minhash_band_index,
)
from .joins import anti_join, broadcast_dim, semi_join, theta_left_join, trim_join
from .packing import chunk_documents, pack_rollup, pack_sequences
from .sketches import heavy_hitters, merged_distinct, sketch_distinct
from .windows import top1_per_group

__all__ = [
    "broadcast_dim",
    "semi_join",
    "anti_join",
    "theta_left_join",
    "trim_join",
    "top1_per_group",
    "quantile_buckets",
    "connected_components",
    "dedup_by_components",
    "minhash_band_index",
    "fingerprint_index",
    "embedding_bucket_index",
    "incremental_dedup",
    "incremental_exact_dedup",
    "incremental_embed_near_dup",
    "pack_sequences",
    "pack_rollup",
    "chunk_documents",
    "sketch_distinct",
    "merged_distinct",
    "heavy_hitters",
]
