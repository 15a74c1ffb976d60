"""Round-14 hardening: the r13 ADVICE items on the takedown id path.

- ``_check_request_ids`` accepts ``numbers.Integral`` (numpy.int64 from
  pandas-sourced pipelines) and canonicalizes to plain ``int`` before
  anything persists — json.dumps rejects numpy scalars, so an
  uncoerced accept would crash the tombstone sidecar write;
- ``retract_ids`` builds its purge list without sorted() so a legacy
  sidecar written before the r13 type guard cannot raise TypeError and
  block retraction of valid ids (same reason tombstone_ids moved off
  sorted() in r12).
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
    """A pre-r13-guard sidecar can hold ids sorted() chokes on (mixed
    int/str ordering TypeError).  The purge-list union is now
    order-preserving dedup, so retraction of valid ids proceeds; the
    stored same-type tombstones are still reaped into the purge."""
    path = str(tmp_path / "bidx_legacy")
    _mk_band_index(spark, path)
    assert ix.tombstone_ids(spark, path, [4]) == 1
    live, _ = ix.live_index(spark, path)
    # simulate the legacy artifact: hand-write a sidecar whose ids mix
    # ints with a stringified int — sorted() on the union would raise
    ix._replace_small_file(
        spark, f"{live}/{ix.TOMBSTONES_FILE}", json.dumps([4, "6"])
    )
    # The old sorted() union raised `'<' not supported between instances
    # of 'str' and 'int'` BEFORE any Spark work, blocking retraction of
    # the perfectly valid request id.  A wrong-typed STORED id may still
    # fail downstream in createDataFrame ("can not accept object") —
    # that's the pre-existing poisoned-sidecar hazard the r13 guard now
    # prevents at write time and is out of scope here; the assertion is
    # only that the SORTING crash is gone.
    try:
        removed = ix.retract_ids(spark, path, [9])
    except Exception as e:
        assert "'<' not supported" not in str(e), (
            f"sorted()-union regression: {e}"
        )
        return
    assert removed >= 1


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
