"""Round-12 hardening: the r11 verdict's latent-robustness nits and the
r11 ADVICE items, each pinned by a test.

- writer-lock reentrancy keys on the CANONICAL root, so one call chain
  addressing the index through two spellings (`/x/idx` vs
  `file:/x/idx`) re-enters instead of self-deadlocking;
- cross-PROCESS contention: a second process holding the slot makes the
  parent fail fast (or serialize behind with ``lock_retries``) — the
  thread-level tests in test_writer_lock.py share a JVM, this one does
  not share anything;
- stranded-stream self-heal (ADVICE): a hard-killed stream's restart
  reclaims its OWN lock via the breadcrumb owner token; a foreign
  owner's lock is never reclaimed;
- the >``_TOMBSTONE_ISIN_MAX`` backlog switches NOT-isin → broadcast
  anti-join with serve parity across the boundary;
- ``pruned_read`` chunks its brace-glob past ``_PRUNED_GLOB_MAX``
  touched buckets, identical rows either side of the threshold;
- ``rebucket_index`` re-sizes at the CALLER's target (ADVICE: the fixed
  500-rows/bucket default left a smaller dial re-firing forever);
- `_tombstone_list` survives a torn ``.tmp`` when the final name is
  present, and raises (never silently under-reports) when both are
  unreadable;
- the old-Spark "Path does not exist" fallback actually fires (ADVICE:
  it matched the error-class NAME, which pre-class engines never emit).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.operators import index_store as ix

DSCHEMA = "doc_id long, text string"
ESCHEMA = "vec_id long, embedding array<double>"


def _mk_band_index(spark, path, n_docs: int = 30):
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(n_docs)]
    docs = spark.createDataFrame(rows, DSCHEMA)
    ix.create_band_index(docs, path, n_buckets=8)
    return docs


def _lock_file(path: str) -> str:
    return f"{path.rstrip('/')}{ix.WRITER_LOCK_SUFFIX}"


# --------------------------------------------------- lock key canonical
def test_writer_lock_reentrant_across_path_spellings(spark, tmp_path):
    """`/x/idx` and `file:/x/idx` spell the SAME slot (same marker
    file): the inner acquire must re-enter, not see "exists" forever
    and self-deadlock (r11 verdict nit — the held-set keyed on the raw
    string)."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    entered = []
    with ix.writer_lock(spark, path, "outer"):
        with ix.writer_lock(spark, f"file:{path}", "inner_uri_spelling"):
            entered.append("uri")
        with ix.writer_lock(spark, path + "/", "inner_trailing_slash"):
            entered.append("slash")
        # a locked op addressed through the other spelling re-enters too
        ix.tombstone_ids(spark, f"file:{path}", [1])
    assert entered == ["uri", "slash"]
    # released exactly once, at the outer exit
    from meta_morph_etl_databricks_spark.sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    assert not fs.exists(path_cls(_lock_file(path)))
    # and the tombstone landed
    assert ix.index_info(spark, path)["pending_tombstones"] == 1


# ------------------------------------------------ cross-process contention
_HOLDER_SCRIPT = """
import os, sys, time
lock, hold_sec = sys.argv[1], float(sys.argv[2])
fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)  # atomic create
os.write(fd, b'{"op": "external_process"}')
os.close(fd)
print("HELD", flush=True)
time.sleep(hold_sec)
os.unlink(lock)
"""


def test_multiprocess_writer_lock_contention(spark, tmp_path):
    """The lock's real adversary is a second PROCESS (two jobs pointed
    at one slot).  A subprocess takes the marker with the same
    O_CREAT|O_EXCL primitive ``_try_acquire_lock`` uses on local disk;
    the parent's compact fails fast while it is held, and with
    ``lock_retries`` serializes behind the holder's release."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)

    proc = subprocess.Popen(
        [sys.executable, "-c", _HOLDER_SCRIPT, _lock_file(path), "6"],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "HELD"
        # fail-fast: the foreign process holds the slot
        with pytest.raises(IOError, match="break_writer_lock"):
            ix.compact_index(spark, path)
        # serialize-behind: poll past the holder's tenure, then win
        t0 = time.time()
        ix.compact_index(spark, path, lock_retries=120, lock_retry_interval_sec=0.25)
        assert time.time() - t0 > 1.0  # it actually waited for the release
    finally:
        proc.wait(timeout=30)
    live, meta = ix.live_index(spark, path)
    assert meta is not None and meta["kind"] == ix.BAND_KIND
    from meta_morph_etl_databricks_spark.sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    assert not fs.exists(path_cls(_lock_file(path)))


# -------------------------------------------------- owner-token reclaim
def test_owner_reclaims_own_stranded_lock_only(spark, tmp_path):
    """A marker whose breadcrumb names the SAME owner token is a dead
    prior incarnation of this job (one-active-query-per-checkpoint) —
    reclaimed without retries.  A foreign owner's marker, a crumbless
    marker (holder mid-acquire), and a torn crumb never reclaim."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    lock = _lock_file(path)

    def strand(body: str | None):
        with open(lock, "x") as f:
            if body is not None:
                f.write(body)

    # same owner → reclaimed, op proceeds with retries=0
    strand(json.dumps({"op": "stream_batch", "owner": "ckpt-A"}))
    with ix.writer_lock(spark, path, "restart", owner="ckpt-A"):
        pass
    assert not os.path.exists(lock)

    # foreign owner → fail loudly, marker intact
    strand(json.dumps({"op": "stream_batch", "owner": "ckpt-OTHER"}))
    with pytest.raises(IOError, match="break_writer_lock"):
        with ix.writer_lock(spark, path, "restart", owner="ckpt-A"):
            pass
    assert os.path.exists(lock)
    os.unlink(lock)

    # crumbless marker (holder mid-acquire) → never reclaimed
    strand(None)
    with pytest.raises(IOError):
        with ix.writer_lock(spark, path, "restart", owner="ckpt-A"):
            pass
    assert os.path.exists(lock)
    os.unlink(lock)

    # torn crumb → never reclaimed
    strand('{"op": "stream_ba')
    with pytest.raises(IOError):
        with ix.writer_lock(spark, path, "restart", owner="ckpt-A"):
            pass
    assert os.path.exists(lock)
    os.unlink(lock)


def test_reclaim_restores_foreign_replacement(spark, tmp_path, monkeypatch):
    """The capture protocol's TOCTOU defense: if the marker CHANGES
    between the owner peek and the rename (a manual break racing the
    reclaim), the re-verify against the CAPTURED file sees the truth
    and restores the innocent writer's marker instead of deleting it.
    Simulated by faking only the peek read."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    lock = _lock_file(path)
    with open(lock, "x") as f:
        f.write(json.dumps({"op": "compact_index", "owner": "OTHER"}))

    real = ix._read_small_file
    calls = {"n": 0}

    def fake_peek(spark_, p):
        calls["n"] += 1
        if calls["n"] == 1 and p == lock:  # the peek: claims our owner
            return json.dumps({"op": "stream_batch", "owner": "MINE"})
        return real(spark_, p)  # the captured-file re-verify reads truth

    monkeypatch.setattr(ix, "_read_small_file", fake_peek)
    from meta_morph_etl_databricks_spark.sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    got = ix._reclaim_own_lock(spark, fs, path_cls, path_cls(lock), lock, "MINE")
    assert got is False
    assert os.path.exists(lock)  # restored, not deleted
    assert not os.path.exists(lock + ".reclaim")
    assert json.load(open(lock))["owner"] == "OTHER"  # content intact
    os.unlink(lock)


def test_stream_restart_self_heals_stranded_lock(spark, tmp_path):
    """The ADVICE scenario end-to-end: a hard-killed stream (kill -9 /
    OOM) strands ``__writer_lock`` with its own checkpoint as owner; on
    restart the first batch must reclaim it and process — not poll out
    its retries and die — and dedup state is intact (replay via
    recover_compaction is safe)."""
    from meta_morph_etl_databricks_spark.streaming.dedup import (
        stream_incremental_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    index_path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(i, " ".join(f"s{i}w{j}" for j in range(30))) for i in range(6)], DSCHEMA
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(DSCHEMA).parquet(str(src) + "/*")
    q = stream_incremental_dedup(stream, index_path, str(tmp_path / "acc"), ckpt)
    q.awaitTermination(120)

    # hard kill left the marker with this stream's own owner token
    with open(_lock_file(index_path), "x") as f:
        f.write(json.dumps({"op": "stream_batch", "owner": ckpt, "acquired_unix": 0}))

    # redeliver batch 1 + one new doc; the restart must reclaim and run
    spark.read.parquet(str(src / "b1")).write.parquet(str(src / "b2"))
    spark.createDataFrame(
        [(100, " ".join(f"n100w{j}" for j in range(30)))], DSCHEMA
    ).write.parquet(str(src / "b3"))
    stream = spark.readStream.schema(DSCHEMA).parquet(str(src) + "/*")
    q = stream_incremental_dedup(stream, index_path, str(tmp_path / "acc"), ckpt)
    q.awaitTermination(180)

    assert not os.path.exists(_lock_file(index_path))  # released normally
    acc = spark.read.parquet(str(tmp_path / "acc"))
    # redelivered ids dropped by the seen filter, the new doc accepted
    assert acc.count() == 7 and acc.where("doc_id = 100").count() == 1


# ------------------------------------------- tombstone isin/anti boundary
def test_tombstone_isin_boundary_parity(spark, tmp_path):
    """Crossing ``_TOMBSTONE_ISIN_MAX`` flips the serve-side hide from a
    pushed-down NOT-isin filter to a broadcast anti-join; both must hide
    exactly the same ids.  The backlog is driven ACROSS the real 1024
    boundary (1020 → 1030 pending) and the serve result is pinned equal
    to the isin path's (obtained by lifting the threshold)."""
    import random

    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)], ESCHEMA
    )
    path = str(tmp_path / "ivf")
    ix.create_ivf_index(emb, path, nlist=4)

    # 1020 pending: isin side of the boundary
    dead = [1, 2, 3] + list(range(10_000, 10_000 + 1017))  # 3 real, rest unknown
    assert ix.tombstone_ids(spark, path, dead) == 1020
    below, _ = ix.open_ivf_index(spark, path)
    below_ids = {r.vec_id for r in below.select("vec_id").collect()}
    assert below_ids == set(range(60)) - {1, 2, 3}

    # +10 more crosses to the anti-join side
    more = [4, 5] + list(range(20_000, 20_008))
    assert ix.tombstone_ids(spark, path, more) == 10
    assert len(ix._tombstone_list(spark, ix.live_root(spark, path))) == 1030
    assert 1030 > ix._TOMBSTONE_ISIN_MAX
    above, meta = ix.open_ivf_index(spark, path)
    above_ids = {r.vec_id for r in above.select("vec_id").collect()}
    assert above_ids == set(range(60)) - {1, 2, 3, 4, 5}

    # parity: the same 1030-id backlog through the isin path
    import meta_morph_etl_databricks_spark.operators.index_store as mod

    old = mod._TOMBSTONE_ISIN_MAX
    try:
        mod._TOMBSTONE_ISIN_MAX = 4096
        isin_df, _ = ix.open_ivf_index(spark, path)
        assert {r.vec_id for r in isin_df.select("vec_id").collect()} == above_ids
    finally:
        mod._TOMBSTONE_ISIN_MAX = old

    # the big backlog serves through a top-k too (anti-join in the plan)
    q = spark.createDataFrame(
        [(0, [rng.uniform(-1, 1) for _ in range(8)])], "query_id long, embedding array<double>"
    )
    got = ix.serve_ivf_topk(q, path, k=5)
    assert got.count() == 5
    assert {r.vec_id for r in got.collect()}.isdisjoint({1, 2, 3, 4, 5})


# ------------------------------------------------- pruned_read chunking
def test_pruned_read_chunks_past_glob_max(spark, tmp_path, monkeypatch):
    """Past ``_PRUNED_GLOB_MAX`` touched values the read splits into
    several globs and unions — same rows, missing buckets still
    skipped, partition column preserved.  The threshold is lowered so
    the chunked path runs at test scale; production behavior below the
    threshold is the single-glob read every other test exercises."""
    root = str(tmp_path / "pr")
    df = spark.createDataFrame(
        [(i, i % 20) for i in range(200)], "doc_id long, pfx int"
    )
    df.write.partitionBy("pfx").parquet(root)

    schema = "doc_id long, pfx int"
    touched = list(range(18)) + [97, 98, 99]  # 3 nonexistent buckets
    expect = {(r.doc_id, r.pfx) for r in df.where(df.pfx < 18).collect()}

    single = ix.pruned_read(spark, root, schema, touched)
    assert {(r.doc_id, r.pfx) for r in single.collect()} == expect

    monkeypatch.setattr(ix, "_PRUNED_GLOB_MAX", 5)  # force 5 chunks
    chunked = ix.pruned_read(spark, root, schema, touched)
    assert {(r.doc_id, r.pfx) for r in chunked.collect()} == expect

    # an all-missing chunk contributes empty, not an error
    monkeypatch.setattr(ix, "_PRUNED_GLOB_MAX", 2)
    nothing = ix.pruned_read(spark, root, schema, [500, 501, 502, 503, 504])
    assert nothing.count() == 0 and nothing.columns == ["doc_id", "pfx"]


def test_path_missing_error_matcher_old_spark_spellings():
    """The fallback must fire for pre-error-class engines (r11 ADVICE:
    it only matched the class NAME 'PATH_NOT_FOUND', which those
    engines never put in the message)."""

    class OldStyle(Exception):  # no getCondition/getErrorClass at all
        pass

    assert ix._is_path_missing_error(OldStyle("Path does not exist: /x/pfx={1,2}"))
    assert ix._is_path_missing_error(
        OldStyle("java.io.FileNotFoundException: /x/pfx=1")
    )
    assert ix._is_path_missing_error(OldStyle("[PATH_NOT_FOUND] Path not found"))
    assert not ix._is_path_missing_error(OldStyle("Permission denied: /x"))

    class ClassedNotMissing(Exception):
        def getCondition(self):
            return "SCHEMA_MISMATCH"

    # a classed error is judged by its CLASS — even if the message
    # happens to contain a missing-path substring
    assert not ix._is_path_missing_error(
        ClassedNotMissing("schema drift near 'Path does not exist'")
    )

    class ClassedMissing(Exception):
        def getCondition(self):
            return "PATH_NOT_FOUND"

    assert ix._is_path_missing_error(ClassedMissing("[PATH_NOT_FOUND] gone"))


# -------------------------------------------------- rebucket target dial
def test_rebucket_resizes_at_the_dial_target(spark, tmp_path):
    """ADVICE fix: the rewrite must satisfy the dial that requested it.
    With target_rows_per_bucket=40, an index at 200 rows/bucket is due;
    after rebucketing AT THAT TARGET the dial reads not-due — before the
    fix the rewrite re-sized at the fixed 500-rows/bucket default and
    the dial re-fired a full rewrite on every poll forever."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(100)], DSCHEMA
    )
    path = str(tmp_path / "bidx")
    # 100 docs x 4 bands = 400 band rows over 2 buckets = 200 rows/bucket
    ix.create_band_index(docs, path, n_buckets=2)
    assert ix.rebucket_due(spark, path, target_rows_per_bucket=40)

    meta = ix.rebucket_index(spark, path, target_rows_per_bucket=40)
    assert meta["n_buckets"] >= 400 // 40  # sized to the caller's target
    assert not ix.rebucket_due(spark, path, target_rows_per_bucket=40)
    # serves unchanged by the layout rewrite
    df, _ = ix.open_band_index(spark, path)
    assert df.select("doc_id").distinct().count() == 100


# -------------------------------------------------- torn-tmp tombstones
# ------------------------------------------- module-review (r12) fixes
def test_append_sem_rows_bumps_counter(spark, tmp_path):
    """The SEM kind's public append helper must feed the drift dial
    like its band/embed siblings (review: it was the one append that
    skipped the bump, freezing semantic_recluster_due at the bootstrap
    count forever)."""
    import random

    from meta_morph_etl_databricks_spark.operators.incremental import (
        semantic_cell_index,
    )
    from meta_morph_etl_databricks_spark.operators.semantic import tree_from_json

    rng = random.Random(5)

    def emb(lo, n):
        return spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(lo, lo + n)],
            ESCHEMA,
        )

    path = str(tmp_path / "semidx")
    meta = ix.create_semantic_index(emb(0, 40), path, k=4, iters=1, dims=8)
    assert ix.live_index(spark, path)[1]["rows"] == 40
    coded = semantic_cell_index(emb(100, 25), tree_from_json(meta["tree"]), 8)
    ix.append_sem_rows(coded, path, meta)
    live, meta2 = ix.live_index(spark, path)
    assert meta2["rows"] == 65  # counter grew with the append
    # the dial reads the grown count — and the resolved= hook matches
    # the self-resolved reading (index_info's no-torn-snapshot path)
    assert ix.semantic_recluster_due(spark, path, drift_factor=0.01) is True
    assert ix.semantic_recluster_due(
        spark, path, drift_factor=0.01, resolved=(live, meta2)
    ) is True


def test_ivf_assignment_preserves_non_bigint_id_type(spark, tmp_path):
    """The numpy assignment kernel (method='auto' flips to it past 64
    lists) must emit the INPUT id type — it hardcoded `long`, so an
    int-id index built with a wide codebook stored int64 parquet under
    an `int` sidecar schema and every later open failed at scan time
    (review finding)."""
    import random

    from meta_morph_etl_databricks_spark.operators.similarity import _assign_numpy

    rng = random.Random(11)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(300)],
        "vec_id int, embedding array<double>",
    )
    cents = [(c, [rng.uniform(-1, 1) for _ in range(6)]) for c in range(70)]
    out = _assign_numpy(emb, cents, "vec_id", "embedding")
    assert dict(out.dtypes)["vec_id"] == "int"

    # end-to-end: 70 lists > the auto-switch threshold, int ids — the
    # store round-trips (create writes through the numpy kernel, open
    # reads with the sidecar's id_type schema)
    path = str(tmp_path / "ivf_int")
    meta = ix.create_ivf_index(emb, path, nlist=70)
    assert meta["id_type"] == "int" and len(meta["centroids"]) > 64
    df, _ = ix.open_ivf_index(spark, path)
    assert df.count() == 300  # the schema'd read works
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    assert ix.serve_ivf_topk(q, path, k=3).count() == 6


def test_glob_metacharacter_roots_rejected(spark, tmp_path):
    """A glob metacharacter in the index ROOT makes every pruned serve
    silently read an EMPTY index (admitting every duplicate) — create,
    init, migrate and pruned_read all refuse loudly instead."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"g{i}w{j}" for j in range(30))) for i in range(5)], DSCHEMA
    )
    for bad in ("bid[2024]x", "bid{a,b}", "bid*", "bid?"):
        with pytest.raises(ValueError, match="glob"):
            ix.create_band_index(docs, str(tmp_path / bad), n_buckets=4)
        with pytest.raises(ValueError, match="glob"):
            ix.init_index(spark, str(tmp_path / bad), {"kind": ix.BAND_KIND})
        with pytest.raises(ValueError, match="glob"):
            ix.pruned_read(spark, str(tmp_path / bad), "doc_id long, pfx int", [1])
    # literal paths unaffected
    ok = str(tmp_path / "plain")
    ix.create_band_index(docs, ok, n_buckets=4)
    assert ix.open_band_index(spark, ok)[0].count() > 0


def test_rebucket_due_converges_when_layout_cannot_grow(spark, tmp_path):
    """An IVF layout capped at nlist must NOT report rebucket-due on
    occupancy alone — the rewrite would re-pick the same n_buckets and
    a rebucket_when_due-style loop would re-run a full rewrite on every
    poll forever (review finding).  The correct signal for that state
    is the retrain dial, which grows nlist AND buckets."""
    import random

    rng = random.Random(13)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)], ESCHEMA
    )
    path = str(tmp_path / "ivf_cap")
    meta = ix.create_ivf_index(emb, path, nlist=4)
    assert meta["n_buckets"] == 4  # nlist-capped layout
    live = ix.live_root(spark, path)
    with open(f"{live}/{ix.ROWS_FILE}", "w") as f:
        f.write("1000000")  # simulate heavy growth since bootstrap
    # occupancy is massively over, but the rewrite cannot grow buckets
    assert ix.rebucket_due(spark, path, target_rows_per_bucket=500) is False
    assert ix.ivf_retrain_due(spark, path) is True  # the right dial fires


def test_tombstone_ids_return_dedupes_request(spark, tmp_path):
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [5, 5, 6]) == 2  # not 3
    assert ix.tombstone_ids(spark, path, [6, 7, 7]) == 1
    assert ix.index_info(spark, path)["pending_tombstones"] == 3


def test_interior_null_element_vectors_get_null_bucket(spark):
    """A right-length vector with a NULL ELEMENT passed both old guards
    (array_max skips NULLs so q_vec stays non-NULL) and landed in
    bucket 0 — at corpus scale every such row piles into one hot bucket
    and cross-joins its honest residents (review finding).  It must get
    the NULL bucket like every other corrupt shape."""
    from meta_morph_etl_databricks_spark.operators.incremental import (
        embedding_bucket_index,
    )
    from meta_morph_etl_databricks_spark.operators.similarity import (
        lsh_bucketed_pairs,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, None, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0]),  # interior NULL
            (1, [1.0] * 8),
            (2, [1.0] * 8),
        ],
        ESCHEMA,
    )
    rows = {r.vec_id: r.bucket for r in embedding_bucket_index(emb, dims=8).collect()}
    assert rows[0] is None and rows[1] is not None and rows[1] == rows[2]
    # the one-shot pair path contains it too — and loses no result pair
    got = lsh_bucketed_pairs(emb, n_planes=4, dims=8, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in got.collect()} == {(1, 2)}


def test_stale_assigner_tree_raises_against_sidecar(spark, tmp_path):
    """A caller holding yesterday's tree while the index was reclustered
    passed the dims check, re-celled the increment against the new cell
    ids, emptied every cell join and silently ACCEPTED every duplicate
    (review finding) — the assigner itself is now validated against the
    sidecar."""
    import random

    from meta_morph_etl_databricks_spark.operators.incremental import (
        incremental_semantic_near_dup,
    )
    from meta_morph_etl_databricks_spark.operators.semantic import (
        kmeans_int8_tree,
        tree_from_json,
    )

    rng = random.Random(21)

    def emb(lo, n):
        return spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(lo, lo + n)],
            ESCHEMA,
        )

    path = str(tmp_path / "semidx")
    meta = ix.create_semantic_index(emb(0, 40), path, k=4, iters=1, dims=8)
    index_df, _ = ix.open_semantic_index(spark, path)
    # a DIFFERENT bootstrap's tree — the stale-assigner hazard
    _, _, stale_tree = kmeans_int8_tree(emb(500, 40), 4, 1, 8, n_docs=40)
    with pytest.raises(ValueError, match="assigner tree"):
        incremental_semantic_near_dup(
            emb(100, 10), index_df, stale_tree, dims=8, index_meta=meta
        )
    # the sidecar's own tree passes (round-trip equality)
    res = incremental_semantic_near_dup(
        emb(100, 10), index_df, tree_from_json(meta["tree"]), dims=8, index_meta=meta
    )
    assert res.accepted.count() <= 10


def test_sinks_do_not_bootstrap_from_empty_or_corrupt_batch(spark, tmp_path):
    """Kafka-style latest-offsets init fires an empty batch 0: the band
    and embed sinks previously pinned n_buckets (and under
    center='auto' a zero center) from it FOREVER (review finding).
    Now: empty batch → no index, retry; all-corrupt embed batch →
    pass-through accepted, retry; first valid batch bootstraps."""
    from meta_morph_etl_databricks_spark.streaming.dedup import (
        stream_incremental_dedup,
        stream_incremental_embed_near_dup,
    )

    # --- band sink: empty batch 0 must not init the index
    bsrc = tmp_path / "bsrc"
    bsrc.mkdir()
    bidx = str(tmp_path / "bidx")
    spark.createDataFrame([], DSCHEMA).write.parquet(str(bsrc / "b0"))
    stream = spark.readStream.schema(DSCHEMA).parquet(str(bsrc) + "/*")
    q = stream_incremental_dedup(
        stream, bidx, str(tmp_path / "bacc"), str(tmp_path / "bckpt")
    )
    q.awaitTermination(120)
    assert ix.live_index(spark, bidx)[1] is None  # no premature bootstrap
    spark.createDataFrame(
        [(i, " ".join(f"b{i}w{j}" for j in range(30))) for i in range(5)], DSCHEMA
    ).write.parquet(str(bsrc / "b1"))
    stream = spark.readStream.schema(DSCHEMA).parquet(str(bsrc) + "/*")
    q = stream_incremental_dedup(
        stream, bidx, str(tmp_path / "bacc"), str(tmp_path / "bckpt")
    )
    q.awaitTermination(120)
    assert ix.live_index(spark, bidx)[1] is not None  # sized from real data
    assert spark.read.parquet(str(tmp_path / "bacc")).count() == 5

    # --- embed sink: empty then all-corrupt then valid
    esrc = tmp_path / "esrc"
    esrc.mkdir()
    eidx = str(tmp_path / "eidx")
    eacc, eckpt = str(tmp_path / "eacc"), str(tmp_path / "eckpt")
    spark.createDataFrame([], ESCHEMA).write.parquet(str(esrc / "b0"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(esrc) + "/*")
    stream_incremental_embed_near_dup(stream, eidx, eacc, eckpt, dims=8).awaitTermination(120)
    assert ix.live_index(spark, eidx)[1] is None

    corrupt = [(0, None), (1, [float("nan")] * 8), (2, [1.0, 2.0])]
    spark.createDataFrame(corrupt, ESCHEMA).write.parquet(str(esrc / "b1"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(esrc) + "/*")
    stream_incremental_embed_near_dup(stream, eidx, eacc, eckpt, dims=8).awaitTermination(120)
    assert ix.live_index(spark, eidx)[1] is None  # still no index...
    assert spark.read.parquet(eacc).count() == 3  # ...corrupt passed through

    import random

    rng = random.Random(31)
    spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(10, 16)], ESCHEMA
    ).write.parquet(str(esrc / "b2"))
    stream = spark.readStream.schema(ESCHEMA).parquet(str(esrc) + "/*")
    stream_incremental_embed_near_dup(stream, eidx, eacc, eckpt, dims=8).awaitTermination(180)
    meta = ix.live_index(spark, eidx)[1]
    assert meta is not None
    assert any(abs(c) > 0 for c in meta["center"])  # centered on REAL data
    assert spark.read.parquet(eacc).count() == 9


# ------------------------------------- kernel-review (r12, third pass)
def test_quantize_contains_interior_null_and_denormal(spark):
    """Interior-NULL elements join the corrupt class at the quantizer
    ROOT (they previously coded non-NULL-with-a-NULL-element, seeding
    int(None) codebook crashes and fabricated centroid-0 PQ codes), and
    denormal-magnitude vectors take the zero-code arm instead of
    overflowing the ANSI tinyint cast."""
    from meta_morph_etl_databricks_spark.operators.quantize import quantize_int8

    emb = spark.createDataFrame(
        [
            (0, [0.5, None, 1.0, 2.0]),        # interior NULL
            (1, [1e-310, -1e-312, 0.0, 0.0]),  # denormal magnitudes
            (2, [1.0, -2.0, 0.5, 0.25]),       # healthy
            (3, None),                          # fully NULL
        ],
        ESCHEMA,
    )
    rows = {r.vec_id: (r.q_vec, r.q_scale) for r in quantize_int8(emb).collect()}
    assert rows[0] == (None, None)            # contained at the root
    assert rows[1] == ([0, 0, 0, 0], 1.0)     # zero at int8 resolution
    assert rows[2][0] is not None and max(abs(v) for v in rows[2][0]) == 127
    assert rows[3] == (None, None)


def test_pq_paths_survive_stored_null_element_codes(spark):
    """Pre-fix indexes can hold NULL-element int8 codes on disk: the
    codebook trainer must skip them as seeds (int(None) killed the
    driver) and pq_encode must emit NULL, not a fabricated centroid-0
    code with a positive norm that outranks true neighbors."""
    from meta_morph_etl_databricks_spark.operators.quantize import (
        pq_codebooks_from_codes,
        pq_encode,
    )

    codes = spark.createDataFrame(
        [(0, [1, None, 3, 4]), (1, [1, 2, 3, 4]), (2, [5, 6, 7, 8])],
        "vec_id long, q_vec array<tinyint>",
    )
    books = pq_codebooks_from_codes(codes, m=2, ksub=2)  # would crash before
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    enc = {r.vec_id: (r.pq_code, r.pq_norm_sq) for r in pq_encode(codes, books).collect()}
    assert enc[0] == (None, None)  # NULL, not centroid-0 fabrication
    assert enc[1][0] is not None and enc[1][1] is not None


def test_lang_id_single_language_markers(spark):
    from meta_morph_etl_databricks_spark.operators.text import (
        lang_id,
        profile_documents,
    )

    docs = spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "zzz qqq")], DSCHEMA
    )
    got = {
        r.doc_id: r.lang
        for r in docs.select(
            "doc_id", lang_id("text", {"en": ["the", "and"]}).alias("lang")
        ).collect()
    }
    assert got == {0: "en", 1: None}
    prof = profile_documents(docs, markers={"en": ["the", "and"]})
    langs = {r.doc_id: r.detected_lang for r in prof.collect()}
    assert langs == {0: "en", 1: None}


def test_pii_empty_kinds_and_token_invariant(spark):
    from meta_morph_etl_databricks_spark.operators.text import pii_counts, redact_pii

    docs = spark.createDataFrame([(0, "mail me: a@b.com")], DSCHEMA)
    # explicit empty selection redacts/counts NOTHING (was: everything)
    out = docs.select(redact_pii("text", kinds=[]).alias("t")).first()["t"]
    assert out == "mail me: a@b.com"
    assert docs.select(pii_counts("text", kinds=[]).alias("p")).first()["p"] == ()
    # a token that itself renders PII-shaped is rejected at the boundary
    with pytest.raises(ValueError, match="token"):
        redact_pii("text", token="<{kind}#4111111111111111>")


def test_profile_null_text_is_uniformly_zero(spark):
    """NULL-text rows previously profiled INCONSISTENTLY (n_tokens 0
    but n_bpe_tokens NULL, review finding).  The adversarial contract
    pins profile metrics non-NULL/bounded (total downstream ordering),
    so the row is now uniformly zeros."""
    from meta_morph_etl_databricks_spark.operators.text import profile_documents

    docs = spark.createDataFrame([(0, None), (1, "two words")], DSCHEMA)
    rows = {r.doc_id: (r.n_tokens, r.n_bpe_tokens) for r in profile_documents(docs).collect()}
    assert rows[0] == (0, 0)  # self-consistent, non-NULL
    assert rows[1][0] == 2


def test_semantic_dedup_raises_on_uniform_dims_mismatch(spark):
    """A 32-dim corpus under the default dims=64 previously no-op'd the
    whole dedup (every row excluded by the wrong-length guard, empty
    assignment, everything accepted with NULL clusters, no signal)."""
    import random

    from meta_morph_etl_databricks_spark.operators.semantic import semantic_dedup

    rng = random.Random(17)
    emb32 = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(20)], ESCHEMA
    )
    with pytest.raises(ValueError, match="dims=64"):
        semantic_dedup(emb32, k=2).count()
    # the documented all-corrupt containment is unchanged: NULL/NaN
    # corpora pass through with NULL clusters, no raise
    corrupt = spark.createDataFrame(
        [(0, None), (1, [float("nan")] * 64)], ESCHEMA
    )
    got = semantic_dedup(corrupt, k=2)
    assert got.count() == 2 and all(r.cluster is None for r in got.collect())


def test_tombstone_list_survives_torn_tmp_when_final_present(spark, tmp_path):
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    ix.tombstone_ids(spark, path, [1, 2])
    live = ix.live_root(spark, path)
    # a crashed update's torn tmp next to a healthy final list
    with open(f"{live}/{ix.TOMBSTONES_FILE}.tmp", "w") as f:
        f.write("[1, 2, 3")  # torn mid-write
    assert set(ix._tombstone_list(spark, live)) == {1, 2}


def test_tombstone_list_refuses_persistently_torn_sidecar(spark, tmp_path):
    """When the final name is ABSENT and the tmp fallback is torn past
    the retry budget, the read must RAISE — returning [] would
    transiently serve taken-down rows (the one illegal outcome)."""
    path = str(tmp_path / "bidx")
    _mk_band_index(spark, path)
    ix.tombstone_ids(spark, path, [1, 2])
    live = ix.live_root(spark, path)
    os.unlink(f"{live}/{ix.TOMBSTONES_FILE}")
    with open(f"{live}/{ix.TOMBSTONES_FILE}.tmp", "w") as f:
        f.write("[1, 2, 3")  # torn, and no final to fall back to
    with pytest.raises(IOError, match="takedown"):
        ix._tombstone_list(spark, live)
