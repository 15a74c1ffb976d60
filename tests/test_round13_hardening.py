"""Round-13 hardening: the r12 ADVICE items (beyond the bench-gate
schema change, pinned in test_bench_gate.py) plus round-13 verdict
tasks.

- ``tombstone_ids``/``retract_ids`` validate request ids against the
  sidecar's id type and fail BEFORE persisting (r13 review: a
  wrong-type id written to the sidecar crashed every later serve);
  dedupe preserves input order instead of sorting (r12 advice);
- the embed sink's BOOTSTRAP validity predicate rejects right-length
  vectors whose elements are NULL — array_max skips NULLs so they
  passed the r12 guard, letting an interior-NULL-only batch 0 size
  n_buckets and seed center='auto' from vectors destined for the NULL
  bucket (r12 advice, low).
"""

from __future__ import annotations

from meta_morph_etl_databricks_spark.operators import index_store as ix

DSCHEMA = "doc_id long, text string"
ESCHEMA = "vec_id long, embedding array<double>"


def _mk_band_index(spark, path, n_docs: int = 30):
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(n_docs)]
    docs = spark.createDataFrame(rows, DSCHEMA)
    ix.create_band_index(docs, path, n_buckets=8)
    return docs


# -------------------------------------------------- tombstone id types
def test_tombstone_ids_rejects_wrong_type_before_persisting(spark, tmp_path):
    """r12 advice removed the accidental sorted() type-guard; the r13
    review showed the real hazard was never orderability — a wrong-type
    id WRITTEN to the sidecar crashes every later append-mode serve
    (``_ids_df``: 'LongType can not accept object x').  The request now
    fails fast against the sidecar's id type and nothing persists."""
    import pytest

    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)  # doc_id bigint
    with pytest.raises(TypeError, match="incompatible id"):
        ix.tombstone_ids(spark, path, [2, "x"])
    with pytest.raises(TypeError, match="incompatible id"):
        ix.tombstone_ids(spark, path, [True])  # bool is not an id
    assert ix.index_info(spark, path)["pending_tombstones"] == 0  # nothing wrote
    with pytest.raises(TypeError, match="incompatible id"):
        ix.retract_ids(spark, path, ["x"])
    # valid ints still land, and the index stays servable afterwards
    assert ix.tombstone_ids(spark, path, [2, 1, 2]) == 2
    docs = spark.createDataFrame(
        [(100, " ".join(f"n{j}" for j in range(30)))], DSCHEMA
    )
    assert ix.serve_incremental_dedup(docs, path).accepted.count() == 1


def test_tombstone_ids_preserves_request_order_same_type(spark, tmp_path):
    path = str(tmp_path / "bidx2")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [9, 3, 7, 3]) == 3
    live, _ = ix.live_index(spark, path)
    assert ix._tombstone_list(spark, live) == [9, 3, 7]
    # idempotent re-request
    assert ix.tombstone_ids(spark, path, [3, 9]) == 0
    assert ix.index_info(spark, path)["pending_tombstones"] == 3


# ------------------------------------- embed-sink bootstrap validity
def test_embed_sink_does_not_bootstrap_from_interior_null_batch(spark, tmp_path):
    """Batch 0 whose only right-length vectors carry NULL ELEMENTS must
    pass through un-indexed (like the all-NaN batch) — array_max skips
    NULLs so the r12 guard accepted them, pinning n_buckets and a
    partial center from rows that all land in the NULL bucket."""
    import random

    from meta_morph_etl_databricks_spark.streaming.dedup import (
        stream_incremental_embed_near_dup,
    )

    esrc = tmp_path / "esrc"
    esrc.mkdir()
    eidx = str(tmp_path / "eidx")
    eacc, eckpt = str(tmp_path / "eacc"), str(tmp_path / "eckpt")

    # batch 0: every vector is dims-long but has a NULL element
    sneaky = [(i, [1.0] * i + [None] + [1.0] * (7 - i)) for i in range(4)]
    spark.createDataFrame(sneaky, ESCHEMA).write.parquet(str(esrc / "b0"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(esrc) + "/*")
    stream_incremental_embed_near_dup(
        stream, eidx, eacc, eckpt, dims=8
    ).awaitTermination(120)
    assert ix.live_index(spark, eidx)[1] is None  # no bootstrap
    assert spark.read.parquet(eacc).count() == 4  # passed through

    # first honest batch bootstraps, centered on real data only
    rng = random.Random(13)
    spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(10, 16)],
        ESCHEMA,
    ).write.parquet(str(esrc / "b1"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(esrc) + "/*")
    stream_incremental_embed_near_dup(
        stream, eidx, eacc, eckpt, dims=8
    ).awaitTermination(180)
    meta = ix.live_index(spark, eidx)[1]
    assert meta is not None
    assert any(abs(c) > 0 for c in meta["center"])
    assert spark.read.parquet(eacc).count() == 10


# ---------------------------------------------------- anchor hygiene
def test_anchor_sweep_is_clean():
    """r12 verdict task 7: COVERAGE.md citations (files, symbols, pytest
    node ids, declared-query names) and reference file:line docstring
    citations must resolve at HEAD — drift fails the suite, not a judge
    spot-check."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "check_anchors.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-1000:]


# ------------------------------------------------- double literal form
def test_dlit_renders_every_double_bit_exactly(spark):
    """The expr-string kernels interpolate doubles via similarity._dlit;
    one batch proves the rendered literal parses back to the SAME bits
    for the adversarial cases: non-finite (repr gave 'nanD' — a
    ParseException pre-fix), signed zero, subnormals, extremes, and
    shortest-repr values."""
    import math
    import struct

    from meta_morph_etl_databricks_spark.operators.similarity import _dlit
    from pyspark.sql import functions as F

    vals = [
        float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
        5e-324, -5e-324, 2.2250738585072014e-308,  # subnormal / min normal
        1.7976931348623157e308, -1.7976931348623157e308,
        0.1, -0.30000000000000004, math.pi, 1e-17, 123456789.123456789,
        1.0000000000000002,  # one ulp above 1
    ]
    row = (
        spark.range(1)
        .select(F.expr("array({})".format(", ".join(_dlit(v) for v in vals))))
        .first()[0]
    )
    assert len(row) == len(vals)
    for want, got in zip(vals, row):
        assert struct.pack("<d", want) == struct.pack("<d", got), (want, got)
