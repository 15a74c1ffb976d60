"""Declared queries for the multimodal-column layer.

``documents.text`` stands in for the binary payload (cast to UTF-8
bytes) — the container has no media files, and the POINT under test is
the binary-column plumbing: metadata/payload split, JVM-side byte
stats, Arrow-batched mapInPandas feature extraction.

Both queries are fully oracle-checked.  q_multimodal_bytes is portable
byte SQL; q_multimodal_features runs mapInPandas on the Spark side, but
the feature kernel (16-bin folded byte histogram) is deterministic, so
the oracle re-derives it relationally: ``byte % 16`` is the byte's low
nibble, which is exactly the even-position characters of
``hex(encode(text))`` — counting a hex digit there IS the histogram
bucket, no byte-extraction function needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import byte_stats, extract_features, to_assets
from ..sources.scans import read_parquet_table
from .registry import register


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(
        spark, sf_dir, "documents", min_partitions=spark.sparkContext.defaultParallelism
    )
    return to_assets(docs, id_col="doc_id", payload_col="text", media_type="text/plain")


@register(
    "q_multimodal_bytes",
    """
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload stats computed JVM-side (no Python): byte length +
    md5 digest — the cheap pre-decode dedup/filter pass."""
    return byte_stats(_doc_assets(spark, sf_dir))


@register(
    "q_multimodal_features",
    # The mapInPandas kernel folds each byte into bucket (byte % 16) and
    # L1-normalizes.  byte % 16 = low nibble = the even-position chars of
    # hex(encode(text)) (1-indexed 2,4,...), so f0 = share of '0' low
    # nibbles.  l1_mass is 1.0 whenever the payload is non-empty (the
    # histogram sums to 1 by construction; the kernel divides by
    # max(total, 1)).  Rounding: DuckDB ROUND on DOUBLE is half-up, same
    # as Spark's F.round — verified on exact 6dp ties (e.g. 25/128).
    """
    WITH h AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               hex(encode(text)) AS hx
        FROM documents
    )
    SELECT doc_id AS asset_id,
           n AS n_bytes,
           CAST(CASE WHEN n > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS l1_mass,
           ROUND(CAST(len(list_filter(range(1, CAST(n AS INT) + 1),
                                      i -> substr(hx, 2*i, 1) = '0')) AS DOUBLE)
                 / (CASE WHEN n > 0 THEN n ELSE 1 END), 6) AS f0
    FROM h
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas): 16-dim folded byte histogram per asset, plus a
    relational rollup proving the features compose with ordinary ops."""
    feats = extract_features(_doc_assets(spark, sf_dir))
    return feats.select(
        "asset_id",
        "n_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, v: a + v), 4).alias("l1_mass"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )
