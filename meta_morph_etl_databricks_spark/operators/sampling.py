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


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-weighted corpus mixing — the sampling-proportions step of
    pre-training data assembly (each source consumed at its own epoch
    rate): a document from source s appears ``floor(w_s)`` times, plus
    one more when its hash bucket falls under ``frac(w_s)`` — so w=2.5
    means 2 guaranteed epochs + a stable 50% third, w=0.5 a 50%
    downsample, w=0 drops the source.

    Deterministic like everything in this module: the fractional draw is
    :func:`hash_bucket` of (seed, id) — membership is a pure function of
    the row, reproducible on any cluster/partitioning/engine.  Shape:
    map-only (a when-ladder for the weight, one sequence-explode for the
    copies); negative weights are rejected, rows with 0 copies are
    filtered before the explode.

    Returns the input rows replicated, plus ``copy_idx`` (1-based) to
    disambiguate epochs downstream (e.g. for per-epoch shuffling salt).
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        bad = {k: w for k, w in weights.items() if w < 0}
        raise ValueError(f"negative mix weights: {bad or default_weight}")

    # whole/fractional parts resolved in PYTHON, per source, and baked
    # into the when-ladder as exact int literals — computing
    # (w - floor(w)) * BUCKETS column-side on binary doubles truncates
    # 0.3*10000 to 2999 under cast('int') (the module convention is
    # int(round(...)), e.g. deterministic_sample)
    import math

    def parts(v: float) -> tuple[int, int]:
        return math.floor(v), int(round((v - math.floor(v)) * BUCKETS))

    d_whole, d_cut = parts(default_weight)
    whole: Column = F.lit(d_whole).cast("bigint")
    frac_cut: Column = F.lit(d_cut)
    for s, v in sorted(weights.items()):
        s_whole, s_cut = parts(v)
        whole = F.when(F.col(source_col) == s, F.lit(s_whole).cast("bigint")).otherwise(whole)
        frac_cut = F.when(F.col(source_col) == s, F.lit(s_cut)).otherwise(frac_cut)
    copies = whole + F.when(hash_bucket(id_col, seed) < frac_cut, 1).otherwise(0)
    return (
        docs.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies")
    )
