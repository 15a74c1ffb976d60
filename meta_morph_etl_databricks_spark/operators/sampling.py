"""Deterministic sampling and train/test splitting for training-data
pipelines.

``df.sample()`` is seed-stable only for a fixed partitioning — any
repartition, file-split change, or cluster resize reshuffles which rows
are sampled.  Hash-bucket sampling keys the decision to the ROW (a
stable id), so the same row lands in the same split on any cluster, any
day, any engine — reproducible train/test membership is a correctness
property for ML pipelines, not a convenience.

md5 is used as the portable hash family (oracle-checkable); swap
xxhash64 for raw speed where cross-engine reproducibility isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # basis-point granularity


def hash_bucket(key: Column | str, seed: int = 0, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5 of the seed-prefixed key.
    Uniform over the 60-bit hex15 prefix; changing ``seed`` draws an
    independent assignment."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string"))), 1, 15), 16, 10)
    return (h.cast("bigint") % buckets).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` (basis-point
    resolution).  Row membership is a pure function of (key, seed)."""
    cut = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(key_col, seed) < cut)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, test) split keyed on ``key_col``:
    every row lands in exactly one side, stably across runs/clusters."""
    cut = int(round(test_fraction * BUCKETS))
    b = hash_bucket(key_col, seed)
    return df.filter(b >= cut), df.filter(b < cut)


def split_column(key: Column | str, test_fraction: float = 0.1, seed: int = 0) -> Column:
    """'train'/'test' label column under the same assignment rule —
    for labelling in place instead of splitting into two frames."""
    cut = int(round(test_fraction * BUCKETS))
    return F.when(hash_bucket(key, seed) < cut, F.lit("test")).otherwise(F.lit("train"))
