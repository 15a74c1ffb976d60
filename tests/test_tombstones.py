"""Tombstone-based takedown (round 11): O(ids) retraction — the ids go
to a tiny atomically-replaced JSON sidecar, serves hide them with a
broadcast anti-join, and the next generational rewrite (compaction /
recluster / retrain / physical retract) reaps rows + seen entries and
drops the sidecar.

The bar: policy equivalence with the physical ``retract_ids`` (a
previously-rejected near-dup flips to accepted; a redelivered
tombstoned id is re-processed), O(ids) write cost is STRUCTURAL (no new
generation, no index rewrite), and re-ingest resurrects the id so the
re-accepted content is servable again.  Plus the round-11 counter split:
``_index_meta.json`` is write-once after a generation completes; the
running row counter lives in ``_rows`` and overlays at resolution time.
"""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.operators import index_store as ix

DIMS = 16
ESCHEMA = "vec_id long, embedding array<double>"
DSCHEMA = "doc_id long, text string"


def _band_docs(spark):
    base = "the quick brown fox jumps over the lazy dog and then some more words " * 4
    rows = [(0, base)] + [
        (i, " ".join(f"u{i}w{j}" for j in range(30))) for i in range(1, 20)
    ]
    return spark.createDataFrame(rows, DSCHEMA), base


def _tomb_file(spark, path):
    return f"{ix.live_root(spark, path)}/{ix.TOMBSTONES_FILE}"


def test_tombstone_policy_band_and_compaction_reap(spark, tmp_path):
    """Same consequence as test_retraction_policy_band, via the O(ids)
    path: B was rejected as a near-dup of indexed A; after tombstoning
    {A, B} a redelivered near-dup C is accepted — with NO generation
    rewrite.  The next compaction physically reaps the rows and drops
    the sidecar; the serve decision is unchanged across the reap."""
    path = str(tmp_path / "bidx")
    docs, base = _band_docs(spark)
    ix.create_band_index(docs, path, n_buckets=8)
    live0 = ix.live_root(spark, path)

    b = spark.createDataFrame([(100, base)], DSCHEMA)
    assert ix.serve_incremental_dedup(b, path).accepted.isEmpty()  # B rejected

    c = spark.createDataFrame([(200, base)], DSCHEMA)
    assert ix.serve_incremental_dedup(c, path, append=False).accepted.isEmpty()

    assert ix.tombstone_ids(spark, path, [0, 100]) == 2
    # O(ids) structurally: the live generation did NOT change (retract_ids
    # would have built gen N+1); only the JSON sidecar appeared
    assert ix.live_root(spark, path) == live0
    assert set(json.load(open(_tomb_file(spark, path)))) == {0, 100}

    got = ix.serve_incremental_dedup(c, path, append=False).accepted
    assert [r.doc_id for r in got.collect()] == [200]  # accepted post-takedown
    # opens hide the ids too
    idx_ids = {r.doc_id for r in ix.open_band_index(spark, path)[0].collect()}
    assert idx_ids.isdisjoint({0, 100})

    # compaction reaps: rows physically gone, sidecar dropped, new gen
    ix.compact_index(spark, path)
    assert ix.live_root(spark, path) != live0
    assert not os.path.exists(_tomb_file(spark, path))
    raw = spark.read.schema(
        ix._band_schema(ix.read_index_meta(spark, path))
    ).parquet(ix.live_root(spark, path))
    assert {r.doc_id for r in raw.collect()}.isdisjoint({0, 100})
    got2 = ix.serve_incremental_dedup(c, path, append=False).accepted
    assert [r.doc_id for r in got2.collect()] == [200]


def test_tombstone_idempotent_unknown_and_legacy(spark, tmp_path):
    import shutil

    path = str(tmp_path / "bidx")
    docs, _ = _band_docs(spark)
    ix.create_band_index(docs, path, n_buckets=8)
    assert ix.tombstone_ids(spark, path, [3, 4]) == 2
    assert ix.tombstone_ids(spark, path, [3, 4, 5]) == 1  # idempotent
    assert ix.tombstone_ids(spark, path, [777]) == 1  # unknown id hides nothing
    assert ix.open_band_index(spark, path)[0].count() > 0
    with pytest.raises(ValueError, match="nothing to retract"):
        ix.tombstone_ids(spark, str(tmp_path / "nope"), [1])
    flat = str(tmp_path / "flat")
    shutil.copytree(ix.live_root(spark, path), flat)
    # the copied sidecar would hijack nothing — legacy flat is refused
    with pytest.raises(ValueError, match="migrate_index"):
        ix.tombstone_ids(spark, flat, [1])


def test_tombstone_vector_kinds_and_ivf_serve(spark, tmp_path):
    """The two dedup vector kinds flip rejected→accepted under a
    tombstone; the IVF kind's serve drops the victim and refills k."""
    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(DIMS)]
    uniq = [[rng.uniform(-1, 1) for _ in range(DIMS)] for _ in range(30)]
    boot = spark.createDataFrame(
        [(0, base)] + [(i + 1, uniq[i]) for i in range(30)], ESCHEMA
    )
    b = spark.createDataFrame([(100, [x * 1.5 for x in base])], ESCHEMA)
    c = spark.createDataFrame([(200, [x * 0.5 for x in base])], ESCHEMA)

    for kind, create, serve in (
        ("embed", ix.create_embedding_index, ix.serve_incremental_embed_near_dup),
        ("sem", ix.create_semantic_index, ix.serve_incremental_semantic_dedup),
    ):
        path = str(tmp_path / f"{kind}idx")
        if kind == "embed":
            create(boot, path, dims=DIMS, n_planes=4, center=None)
        else:
            create(boot, path, k=3, iters=1, dims=DIMS)
        assert serve(b, path, threshold=0.999).accepted.isEmpty()
        assert ix.tombstone_ids(spark, path, [0, 100]) == 2
        got = serve(c, path, threshold=0.999).accepted
        assert [r.vec_id for r in got.collect()] == [200], kind

    ipath = str(tmp_path / "ivf")
    ix.create_ivf_index(boot, ipath, nlist=4)
    q = boot.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    before = ix.serve_ivf_topk(q, ipath, k=5, nprobe=2)
    victim = before.collect()[0].vec_id
    ix.tombstone_ids(spark, ipath, [victim])
    after = ix.serve_ivf_topk(q, ipath, k=5, nprobe=2)
    assert victim not in {r.vec_id for r in after.collect()}
    assert after.count() == before.count()  # k refills from the rest


def test_retract_folds_pending_tombstones(spark, tmp_path):
    """A physical retract reaps the pending tombstone backlog too — any
    generational rewrite leaves the new generation with a clean slate."""
    path = str(tmp_path / "bidx")
    docs, _ = _band_docs(spark)
    ix.create_band_index(docs, path, n_buckets=8)
    ix.tombstone_ids(spark, path, [1, 2])
    removed = ix.retract_ids(spark, path, [3])
    assert removed > 0  # counts the PASSED ids' rows
    assert not os.path.exists(_tomb_file(spark, path))
    raw = spark.read.schema(
        ix._band_schema(ix.read_index_meta(spark, path))
    ).parquet(ix.live_root(spark, path))
    assert {r.doc_id for r in raw.collect()}.isdisjoint({1, 2, 3})


def test_recluster_reaps_tombstones_and_counter_tracks(spark, tmp_path):
    """The semantic rebuild reaps pending tombstones; the row counter in
    the rebuilt sidecar equals the physically-counted rows (reaped rows
    excluded)."""
    boot = spark.createDataFrame(
        [(i, [float(i % 5), 1.0] + [0.0] * (DIMS - 2)) for i in range(40)], ESCHEMA
    )
    path = str(tmp_path / "semidx")
    ix.create_semantic_index(boot, path, k=4, iters=1, dims=DIMS, target_cell_size=5)
    ix.tombstone_ids(spark, path, [0, 1, 2])
    meta = ix.recluster_semantic_index(spark, path)
    assert meta["rows"] == 37
    raw = spark.read.schema(ix._sem_schema(meta)).parquet(ix.live_root(spark, path))
    assert raw.count() == 37
    assert not os.path.exists(_tomb_file(spark, path))


def test_streaming_redelivery_resurrects_tombstoned_id(spark, tmp_path):
    """Streaming story, tombstone edition: a tombstoned id's redelivery
    is RE-PROCESSED (its seen entry is masked, not purged), the sink
    clears the tombstone on the committed re-ingest, and the re-accepted
    content is servable again — a later near-dup REJECTS against it."""
    from meta_morph_etl_databricks_spark.streaming.dedup import (
        stream_incremental_dedup,
    )

    docs, base = _band_docs(spark)
    src = tmp_path / "src"
    src.mkdir()
    path = str(tmp_path / "sidx")
    acc = str(tmp_path / "sacc")

    def run_once():
        q = stream_incremental_dedup(
            spark.readStream.schema(DSCHEMA).parquet(str(src) + "/*"),
            path,
            acc,
            str(tmp_path / "sck"),
            n_buckets=8,
        )
        q.awaitTermination(120)

    docs.write.parquet(str(src / "b1"))
    run_once()
    assert 0 in {r.doc_id for r in spark.read.parquet(acc).collect()}

    assert ix.tombstone_ids(spark, path, [0]) == 1

    # redeliver id 0 with the same content: seen entry masked → batch
    # re-processes it; committed re-ingest clears the tombstone
    spark.createDataFrame([(0, base)], DSCHEMA).write.parquet(str(src / "b2"))
    run_once()
    accepted = [r.doc_id for r in spark.read.parquet(acc).collect()]
    assert accepted.count(0) == 2  # bootstrap acceptance + redelivery
    assert not os.path.exists(_tomb_file(spark, path))  # resurrected

    # content is back: a near-dup of it rejects again
    d = spark.createDataFrame([(300, base)], DSCHEMA)
    assert ix.serve_incremental_dedup(d, path, append=False).accepted.isEmpty()


def test_meta_sidecar_is_write_once_and_counter_overlays(spark, tmp_path):
    """The round-11 split: after incremental serves the on-disk
    ``_index_meta.json`` still holds the BUILD-TIME count (write-once
    completeness marker — the round-10 advice's torn-write window is
    gone because the file is never rewritten), the running value lives
    in ``_rows``, ``read_index_meta`` overlays it, and deleting
    ``_rows`` degrades to the build-time count instead of failing."""
    path = str(tmp_path / "semidx")
    boot = spark.createDataFrame(
        [(i, [float(i % 5), 1.0] + [0.0] * (DIMS - 2)) for i in range(10)], ESCHEMA
    )
    ix.create_semantic_index(boot, path, k=2, iters=1, dims=DIMS, target_cell_size=5)
    inc = spark.createDataFrame(
        [(100 + i, [float(i % 7), -1.0] + [0.0] * (DIMS - 2)) for i in range(20)],
        ESCHEMA,
    )
    ix.serve_incremental_semantic_dedup(inc, path, threshold=0.9999)

    live = ix.live_root(spark, path)
    on_disk = json.load(open(f"{live}/{ix.META_FILE}"))
    assert on_disk["rows"] == 10  # build-time value, never rewritten
    assert open(f"{live}/{ix.ROWS_FILE}").read().strip() == "30"
    assert ix.read_index_meta(spark, path)["rows"] == 30  # overlay

    os.remove(f"{live}/{ix.ROWS_FILE}")
    assert ix.read_index_meta(spark, path)["rows"] == 10  # graceful degrade
    # the dial still answers (late, never broken)
    assert ix.semantic_recluster_due(spark, path, drift_factor=0.1) in (True, False)


def test_tombstone_write_crash_windows(spark, tmp_path, monkeypatch):
    """The takedown sidecar replace is tmp+rename: a crash BEFORE the
    rename must leave the previous tombstone list fully intact (no torn
    JSON, no partial takedown), and the stranded ``.tmp`` must not leak
    into reads or block the retried takedown."""
    path = str(tmp_path / "bidx")
    docs, _ = _band_docs(spark)
    ix.create_band_index(docs, path, n_buckets=8)
    assert ix.tombstone_ids(spark, path, [1, 2]) == 2
    live = ix.live_root(spark, path)

    real_write = ix._write_small_file

    def die_after_tmp(spark_, p, text):
        real_write(spark_, p, text)
        if p.endswith(f"{ix.TOMBSTONES_FILE}.tmp"):
            raise RuntimeError("crash between tmp write and rename")

    monkeypatch.setattr(ix, "_write_small_file", die_after_tmp)
    with pytest.raises(RuntimeError, match="crash between"):
        ix.tombstone_ids(spark, path, [3, 4])
    monkeypatch.setattr(ix, "_write_small_file", real_write)

    # old list intact and readable; the in-flight ids were NOT applied
    assert ix._tombstone_list(spark, live) == [1, 2]
    # the writer lock was released by the finally — retry succeeds and
    # the rename-over simply replaces the stranded tmp
    assert ix.tombstone_ids(spark, path, [3, 4]) == 2
    assert ix._tombstone_list(spark, live) == [1, 2, 3, 4]
    # next generational rewrite reaps everything, sidecar and tmp alike
    ix.compact_index(spark, path)
    live2 = ix.live_root(spark, path)
    assert ix._tombstone_list(spark, live2) == []
    df, _ = ix.open_band_index(spark, path)
    assert df.where(df.doc_id.isin([1, 2, 3, 4])).isEmpty()
