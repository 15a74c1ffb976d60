"""Round-13 hardening: the r12 ADVICE items (beyond the bench-gate
schema change, pinned in test_bench_gate.py) plus round-13 verdict
tasks.

- ``tombstone_ids`` accepts an unorderable (mixed-type) takedown list:
  dedupe preserves input order instead of sorting, so int+str id mixes
  succeed where sorted() raised TypeError (r12 advice, low);
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


# -------------------------------------------------- tombstone id mixes
def test_tombstone_ids_accepts_mixed_type_unorderable_ids(spark, tmp_path):
    """A takedown list mixing id types is valid for set membership yet
    unorderable — sorted() raised TypeError where the sidecar write
    itself is fine.  Dedupe now preserves input order (r12 advice)."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    # ints first, then strs alongside more ints — previously raised on
    # the second call when the union {1, 2, "x"} hit sorted()
    assert ix.tombstone_ids(spark, path, [2, 1, 2]) == 2
    assert ix.tombstone_ids(spark, path, ["x", 3, "x"]) == 2
    live, _ = ix.live_index(spark, path)
    tombs = ix._tombstone_list(spark, live)
    # file order: first request's order, then the second's appended
    assert tombs == [2, 1, "x", 3]
    # idempotent re-request across both types
    assert ix.tombstone_ids(spark, path, [1, "x"]) == 0
    assert ix.index_info(spark, path)["pending_tombstones"] == 4


def test_tombstone_ids_preserves_request_order_same_type(spark, tmp_path):
    path = str(tmp_path / "bidx2")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [9, 3, 7, 3]) == 3
    live, _ = ix.live_index(spark, path)
    assert ix._tombstone_list(spark, live) == [9, 3, 7]


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
