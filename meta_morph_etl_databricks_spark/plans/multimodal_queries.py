"""Declared queries for the multimodal-column layer.

``documents.text`` stands in for the binary payload (cast to UTF-8
bytes) — the container has no media files, and the POINT under test is
the binary-column plumbing: metadata/payload split, JVM-side byte
stats, Arrow-batched mapInPandas feature extraction.

q_multimodal_bytes is fully oracle-checked (byte ops are portable SQL).
q_multimodal_features is mapInPandas (Python feature kernel) — not
SQL-expressible, registered WITHOUT an oracle so the driver records the
rows-only check; cell-level correctness is covered by
tests/test_multimodal.py against a driver-side reference.
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


@register("q_multimodal_features")  # mapInPandas — rows-only check
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
