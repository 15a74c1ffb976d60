"""Multimodal binary-column plumbing: byte stats, Arrow-batched feature
extraction, the fake-codec decode path, and frame sampling."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.operators.multimodal import (
    _fold_histogram,
    byte_stats,
    decode_images,
    extract_features,
    sample_frames,
    to_assets,
)
from meta_morph_etl_databricks_spark.sources.scans import read_parquet_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents").limit(50)
    return to_assets(docs, id_col="doc_id", payload_col="text", media_type="text/plain").cache()


def test_byte_stats_matches_python(spark, assets):
    rows = byte_stats(assets).collect()
    raw = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes == len(raw[r.asset_id])
        assert r.digest == hashlib.md5(raw[r.asset_id]).hexdigest()


def test_extract_features_matches_reference(spark, assets):
    feats = {r.asset_id: r.features for r in extract_features(assets).collect()}
    raw = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    for aid, payload in raw.items():
        assert feats[aid] == pytest.approx(_fold_histogram(payload, 16))
        assert sum(feats[aid]) == pytest.approx(1.0)


def test_decode_images_fake_codec(spark):
    payloads = [
        (1, struct.pack("<HH", 4, 3) + bytes(range(12))),
        (2, struct.pack("<HH", 2, 2) + b"\xff" * 4),
    ]
    df = spark.createDataFrame(payloads, "asset_id long, payload binary")
    assets = to_assets(df, id_col="asset_id", payload_col="payload", media_type="image/fake")
    got = {r.asset_id: r for r in decode_images(assets, fake_codec=True).collect()}
    assert (got[1].width, got[1].height) == (4, 3)
    assert bytes(got[1].pixels) == bytes(range(12))
    assert (got[2].width, got[2].height) == (2, 2)


def test_decode_images_requires_codec(spark, assets):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_images(assets, fake_codec=False)


def test_sample_frames(spark):
    payload = b"".join(bytes([i] * 4) for i in range(10))  # 10 frames x 4 bytes
    df = spark.createDataFrame([(7, payload)], "asset_id long, payload binary")
    assets = to_assets(df, id_col="asset_id", payload_col="payload", media_type="video/fake")
    frames = sample_frames(assets, frame_bytes=4, every_n=3).sort("frame_idx").collect()
    assert [f.frame_idx for f in frames] == [0, 3, 6, 9]
    assert all(bytes(f.frame) == bytes([f.frame_idx] * 4) for f in frames)


def test_metadata_projection_prunes_payload_from_scan(spark, sf_dir):
    """Selecting only id + metadata must prune the payload source column
    out of the parquet ReadSchema (blob pages never read)."""
    docs = read_parquet_table(spark, sf_dir, "documents")
    assets = to_assets(docs, id_col="doc_id", payload_col="text", media_type="text/plain")
    plan = (
        assets.select("asset_id", F.col("meta.media_type").alias("mt"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" not in read_schema and "doc_id" in read_schema
