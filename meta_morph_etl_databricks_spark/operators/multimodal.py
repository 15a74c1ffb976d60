"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas functions over
``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested.  The codec step itself is stubbed: the
container has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the deterministic
byte-level feature extractor stands in for a real embedding model.  On
a cluster with codecs installed, only ``_decode_real`` changes.

Scale notes:
- payloads ride in the row (parquet binary column).  At 100 TB the scan
  splits on maxPartitionBytes and each Arrow batch holds a bounded
  number of payloads (spark.sql.execution.arrow.maxRecordsPerBatch) —
  no driver materialization anywhere.
- metadata lives in a separate struct column so filters on it
  (media_type, width, duration) prune via predicate pushdown WITHOUT
  touching payload bytes (parquet column pruning skips the blob pages).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def to_assets(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type: str = "application/octet-stream",
    fmt: str | None = None,
) -> DataFrame:
    """Wrap any binary (or string — cast to UTF-8 bytes) column as a
    typed media-asset DataFrame (asset_id, payload, meta struct)."""
    payload = F.col(payload_col).cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def byte_stats(assets: DataFrame) -> DataFrame:
    """Pure-relational payload stats — no Python: byte length and md5
    digest, computed JVM-side.  This is the cheap pre-filter/dedup pass
    that runs BEFORE any expensive decode."""
    return assets.select(
        "asset_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


FEATURE_DIMS = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fold_histogram(payload: bytes, dims: int) -> list[float]:
    """Deterministic stand-in for a learned embedding: 256-bin byte
    histogram folded into ``dims`` buckets, L1-normalized.  Vectorized —
    a per-byte CPython loop here was the single slowest kernel in the
    whole bench (~10 s/query at sf0.1 vs <2 s vectorized)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr % dims if dims < 256 else arr, minlength=dims)
    total = float(counts.sum()) or 1.0
    return (counts / total).tolist()


def extract_features(assets: DataFrame, dims: int = FEATURE_DIMS) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: each batch is
    a pandas DataFrame of payloads, the output is (asset_id, n_bytes,
    features array<double>).  Swap ``_fold_histogram`` for a model
    forward pass to get real embeddings with identical plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(lambda p: _fold_histogram(bytes(p), dims)),
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, schema=_FEATURE_SCHEMA)


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def decode_images(assets: DataFrame, fake_codec: bool = False) -> DataFrame:
    """Image decode via mapInPandas.

    Real path requires PIL (not installed in this container) — it
    raises ``NotImplementedError`` at plan-build time so the failure is
    immediate, not mid-job.  ``fake_codec=True`` uses the test codec: a
    payload of ``width:uint16-LE ++ height:uint16-LE ++ raw bytes``,
    which keeps every piece of Spark plumbing (schema, batching,
    explode-ready output) real and testable.
    """
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil and not fake_codec:
        raise NotImplementedError(
            "image decode needs PIL (unavailable here); pass fake_codec=True "
            "for the deterministic test codec"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        out_ids, ws, hs, px = [], [], [], []
        for pdf in batches:
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                if have_pil and not fake_codec:
                    img = PIL.Image.open(io.BytesIO(raw))
                    w, h = img.size
                    pixels = img.tobytes()
                else:
                    w = int.from_bytes(raw[0:2], "little")
                    h = int.from_bytes(raw[2:4], "little")
                    pixels = raw[4:]
                out_ids.append(aid)
                ws.append(w)
                hs.append(h)
                px.append(pixels)
            yield pd.DataFrame({"asset_id": out_ids, "width": ws, "height": hs, "pixels": px})
            out_ids, ws, hs, px = [], [], [], []

    return assets.select("asset_id", "payload").mapInPandas(run, schema=_DECODED_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, frame_bytes: int, every_n: int = 1) -> DataFrame:
    """Frame sampling for fixed-frame-size payloads (the video shape:
    one row in, many frame rows out — mapInPandas is Spark's UDTF-style
    fan-out).  Takes every ``every_n``-th frame of ``frame_bytes``
    bytes; a real container format would use its index boxes instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw) // frame_bytes
                for i in range(0, n, every_n):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.select("asset_id", "payload").mapInPandas(run, schema=_FRAME_SCHEMA)
