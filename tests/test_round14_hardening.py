"""Round-14 hardening: the r13 ADVICE items on the takedown id path,
the new compaction dial, and the Expand plan family pins.

- ``_check_request_ids`` accepts ``numbers.Integral`` (numpy.int64 from
  pandas-sourced pipelines) and canonicalizes to plain ``int`` before
  anything persists — json.dumps rejects numpy scalars, so an
  uncoerced accept would crash the tombstone sidecar write;
- legacy pre-guard sidecars holding wrong-typed junk can neither crash
  retraction (order-preserving purge union + ``_typed_stored_
  tombstones`` filter) nor serves/seen-thinning/resurrection, and
  sidecar rewrites heal the junk out;
- ``compact_due`` — the O(1) small-file dial over the ``_appends``
  counter: bumps per committed append (batch AND streaming), resets
  free on any generational rewrite, surfaced by ``index_info``;
- ``cube()`` / SQL GROUPING SETS pinned against manual union-of-group-
  bys (first-principles evidence for the Expand family the
  ``q_quantiles_by_status`` rollup oracle arm represents).
"""

from __future__ import annotations

import json

from meta_morph_etl_databricks_spark.operators import index_store as ix

DSCHEMA = "doc_id long, text string"


def _mk_band_index(spark, path, n_docs: int = 30):
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(30))) for i in range(n_docs)]
    docs = spark.createDataFrame(rows, DSCHEMA)
    ix.create_band_index(docs, path, n_buckets=8)
    return docs


def test_numpy_integral_ids_accepted_and_coerced(spark, tmp_path):
    """numpy.int64 ids are valid keys of a bigint index (pandas hands
    them over routinely); the guard must not reject them, and the
    persisted sidecar must hold plain JSON ints."""
    import numpy as np

    path = str(tmp_path / "bidx_np")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [np.int64(3), np.int32(5)]) == 2
    live, _ = ix.live_index(spark, path)
    stored = ix._tombstone_list(spark, live)
    assert stored == [3, 5]
    assert all(type(i) is int for i in stored)  # json-native, not numpy
    # the sidecar itself round-trips through json cleanly
    json.dumps(stored)
    # retraction with numpy ids physically removes the doc's band rows
    assert ix.retract_ids(spark, path, [np.int64(7)]) >= 1
    assert ix.index_info(spark, path)["pending_tombstones"] == 0  # reaped


def test_numpy_bool_still_rejected(spark, tmp_path):
    """np.bool_ is Integral-adjacent in spirit but must stay rejected:
    True tombstoning id 1 silently is the original hazard."""
    import numpy as np
    import pytest

    path = str(tmp_path / "bidx_npb")
    _mk_band_index(spark, path)
    with pytest.raises(TypeError, match="incompatible id"):
        ix.tombstone_ids(spark, path, [True])
    # np.bool_ is not a numbers.Integral subclass → rejected by class
    with pytest.raises(TypeError, match="incompatible id"):
        ix.tombstone_ids(spark, path, [np.bool_(True)])


def test_retract_ids_survives_unsortable_legacy_sidecar(spark, tmp_path):
    """A pre-r13-guard sidecar can hold wrong-typed junk (a stringified
    int under a bigint index) that both sorted() and createDataFrame
    choke on.  Retraction must fully SUCCEED regardless: the purge
    union is order-preserving dedup and the stored list passes through
    the type filter (junk can never match a stored row, so dropping it
    un-hides nothing); valid stored tombstones are still reaped and
    the rewrite heals the sidecar."""
    path = str(tmp_path / "bidx_legacy")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [4]) == 1
    live, _ = ix.live_index(spark, path)
    # the legacy artifact: ints mixed with a stringified int
    ix._replace_small_file(
        spark, f"{live}/{ix.TOMBSTONES_FILE}", json.dumps([4, "6"])
    )
    # serves stay resilient against the junk sidecar: id 4 is hidden,
    # the junk hides nothing, nothing crashes
    docs = spark.createDataFrame(
        [(200, " ".join(f"n{j}" for j in range(30)))], DSCHEMA
    )
    assert ix.serve_incremental_dedup(docs, path, append=False).accepted.count() == 1
    # retraction of a valid id succeeds AND reaps the valid stored
    # tombstone (4) into the purge; the new generation's sidecar is gone
    assert ix.retract_ids(spark, path, [9]) >= 1
    live2, _ = ix.live_index(spark, path)
    assert live2 != live
    assert ix._tombstone_list(spark, live2) == []
    stored = spark.read.parquet(live2)
    assert stored.where("doc_id IN (4, 9)").count() == 0  # both purged


def test_takedown_rewrite_heals_legacy_sidecar_junk(spark, tmp_path):
    """The next takedown's sidecar rewrite drops pre-guard junk instead
    of carrying it forward to crash a later serve/_ids_df."""
    path = str(tmp_path / "bidx_heal")
    _mk_band_index(spark, path)
    live, _ = ix.live_index(spark, path)
    ix._replace_small_file(
        spark, f"{live}/{ix.TOMBSTONES_FILE}", json.dumps([2, "junk", 5])
    )
    assert ix.tombstone_ids(spark, path, [7]) == 1
    assert ix._tombstone_list(spark, live) == [2, 5, 7]  # junk healed out
    # resurrection path is sorted()-free too: clearing an id with junk
    # present neither crashes nor loses the other pending takedowns
    ix._replace_small_file(
        spark, f"{live}/{ix.TOMBSTONES_FILE}", json.dumps([2, "junk", 5])
    )
    ix.clear_tombstones(spark, live, [5])
    assert [i for i in ix._tombstone_list(spark, live) if i != "junk"] == [2]


def test_compact_due_counts_appends_and_resets_on_rewrite(spark, tmp_path):
    """r14: the small-file dial.  Committed appends bump the _appends
    counter O(1); compact_due fires at the threshold; ANY generational
    rewrite resets it for free (the counter lives in the live gen dir);
    index_info surfaces both."""
    path = str(tmp_path / "bidx_dial")
    docs = _mk_band_index(spark, path)
    assert ix.compact_due(spark, path, max_appends=2) is False
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 0

    def inc(ids):
        rows = [(i, " ".join(f"x{i}w{j}" for j in range(30))) for i in ids]
        return spark.createDataFrame(rows, DSCHEMA)

    ix.serve_incremental_dedup(inc([100, 101]), path, append=True)
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 1
    assert ix.compact_due(spark, path, max_appends=2) is False
    ix.serve_incremental_dedup(inc([102]), path, append=True)
    info = ix.index_info(spark, path)
    assert info["appends_since_rewrite"] == 2
    assert ix.compact_due(spark, path, max_appends=2) is True
    assert info["compact_due"] is False  # default threshold (8) not yet hit

    # the dial is O(1): it reads one small file, no index scan — pin the
    # structural property by pointing it at a counter we hand-write
    live, meta = ix.live_index(spark, path)
    ix._replace_small_file(spark, f"{live}/{ix.APPENDS_FILE}", "99")
    assert ix.compact_due(spark, path) is True
    assert ix.index_info(spark, path)["compact_due"] is True

    # any generational rewrite resets: compact, then the counter is gone
    ix.compact_index(spark, path)
    info2 = ix.index_info(spark, path)
    assert info2["appends_since_rewrite"] == 0
    assert ix.compact_due(spark, path, max_appends=2) is False
    # post-reset appends count again and serving still works
    ix.serve_incremental_dedup(inc([103]), path, append=True)
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 1
    assert docs is not None


def test_cube_and_grouping_sets_match_manual_unions(spark):
    """r14: the rollup oracle arm (q_quantiles_by_status) represents
    the Expand plan family; this pins the OTHER two members against
    first principles — cube() equals the union of all four manual
    GROUP BYs, and SQL GROUPING SETS equals exactly the sets asked
    for, with grouping_id() disambiguating all-NULL group values."""
    from pyspark.sql import functions as F

    rows = [
        ("F", "HIGH", 10.0), ("F", "LOW", 20.0), ("O", "HIGH", 5.0),
        ("O", None, 7.0), ("P", "LOW", 3.0), ("F", "HIGH", 2.0),
    ]
    df = spark.createDataFrame(rows, "status string, prio string, v double")

    cube = {
        (r.status, r.prio, r.gid, r.cnt, r.s)
        for r in df.cube("status", "prio")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("s"),
        )
        .collect()
    }
    manual = set()
    for gid, keys in [(0, ["status", "prio"]), (1, ["status"]), (2, ["prio"]), (3, [])]:
        agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"))
        for r in agg.collect():
            d = r.asDict()
            manual.add((d.get("status"), d.get("prio"), gid, d["cnt"], d["s"]))
    assert cube == manual
    # the (O, NULL) DATA group at gid=0 and the O rollup row at gid=1
    # are distinct rows — grouping_id is what tells them apart
    assert ("O", None, 0, 1, 7.0) in cube and ("O", None, 1, 2, 12.0) in cube

    df.createOrReplaceTempView("gs_t")
    gs = {
        (r.status, r.prio, r.gid, r.cnt)
        for r in spark.sql(
            """SELECT status, prio, CAST(grouping_id() AS INT) AS gid,
                      COUNT(*) AS cnt
               FROM gs_t GROUP BY GROUPING SETS ((status), (prio))"""
        ).collect()
    }
    expect = {(d.get("status"), d.get("prio"), gid, d["cnt"])
              for gid, keys in [(1, ["status"]), (2, ["prio"])]
              for d in (r.asDict() for r in
                        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")).collect())}
    assert gs == expect


def test_streaming_batches_bump_the_compaction_dial(spark, tmp_path):
    """The streaming sinks' per-batch appends feed the same _appends
    counter the batch dial reads — compact_every and compact_due are
    one policy counted two ways, and a compact_every trigger resets
    the counter like any generational rewrite."""
    import random

    from meta_morph_etl_databricks_spark.streaming.dedup import stream_ivf_ingest

    rng = random.Random(5)
    schema = "vec_id long, embedding array<double>"

    def vecs(ids):
        return [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in ids]

    src = tmp_path / "dsrc"
    src.mkdir()
    path = str(tmp_path / "didx")
    ckpt = str(tmp_path / "dckpt")

    def run_once(**kw):
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = stream_ivf_ingest(stream, path, ckpt, **kw)
        q.awaitTermination(120)

    spark.createDataFrame(vecs(range(30)), schema).write.parquet(str(src / "b1"))
    run_once()  # bootstrap batch: create, no append yet
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 0
    spark.createDataFrame(vecs(range(30, 60)), schema).write.parquet(str(src / "b2"))
    run_once()
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 1
    assert ix.compact_due(spark, path, max_appends=1) is True
    # a compact_every-triggered compaction resets the dial
    spark.createDataFrame(vecs(range(60, 90)), schema).write.parquet(str(src / "b3"))
    run_once(compact_every=1)
    assert ix.index_info(spark, path)["appends_since_rewrite"] == 0
    assert ix.compact_due(spark, path, max_appends=1) is False


def test_float_kernel_string_path_matches_column_path(spark):
    """similarity.dot/norm/cosine_with_norms: the r14 F.expr fast path
    (string column refs, one py4j round trip) must agree with the
    Column-lambda form on every degenerate shape the kernels guard —
    NULL vector, empty vector, NaN/Inf component, zero norm — and on
    alias-qualified refs (`a.embedding`)."""
    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators.similarity import (
        cosine_with_norms,
        dot,
        norm,
    )

    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, None, [1.0, 0.0, 0.0]),
        (3, [], []),
        (4, [float("nan"), 1.0, 0.0], [1.0, 1.0, 1.0]),
        (5, [float("inf"), 1.0, 0.0], [1.0, 1.0, 1.0]),
        (6, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "id long, u array<double>, v array<double>")
    base = df.select(
        "id",
        "u",
        "v",
        norm(F.col("u")).alias("nu_col"),
        norm("u").alias("nu_str"),
        dot(F.col("u"), F.col("v")).alias("d_col"),
        dot("u", "v").alias("d_str"),
    )
    both = base.select(
        "id",
        "nu_col",
        "nu_str",
        "d_col",
        "d_str",
        cosine_with_norms(F.col("u"), F.col("v"), F.col("nu_col"), F.col("nu_col")).alias("c_col"),
        cosine_with_norms("u", "v", "nu_str", "nu_str").alias("c_str"),
    )
    for r in both.collect():
        for a, b in (("nu_col", "nu_str"), ("d_col", "d_str"), ("c_col", "c_str")):
            va, vb = getattr(r, a), getattr(r, b)
            same = (va is None and vb is None) or va == vb or (va != va and vb != vb)
            assert same, (r.id, a, va, b, vb)
    # alias-qualified refs resolve through the string path
    withn = df.select("id", "u", "v", norm("u").alias("nu"), norm("v").alias("nv"))
    a, b = withn.alias("a"), withn.alias("b")
    q = a.join(b, F.col("a.id") == F.col("b.id")).select(
        F.col("a.id").alias("id"),
        cosine_with_norms("a.u", "b.v", "a.nu", "b.nv").alias("c_str"),
        cosine_with_norms(
            F.col("a.u"), F.col("b.v"), F.col("a.nu"), F.col("b.nv")
        ).alias("c_col"),
    )
    for r in q.collect():
        same = r.c_str == r.c_col or (r.c_str != r.c_str and r.c_col != r.c_col)
        assert same, (r.id, r.c_str, r.c_col)
