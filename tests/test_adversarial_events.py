"""Adversarial event-stream content through the time-series joins:
NULL keys, NULL timestamps, duplicate (key, ts) right rows, inverted
intervals.  Event logs at scale contain all of these (dropped fields,
clock bugs, retried writes); the join operators must keep equi-join
NULL semantics — a NULL never matches a NULL — and never fan out.
"""

from __future__ import annotations

import datetime

import pytest


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, None), (2, _ts(5)), (None, _ts(7)), (3, _ts(1))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "a"), (1, _ts(8), "b"), (None, _ts(6), "n"), (2, None, "x")],
        "user_id long, ts timestamp, tag string",
    )
    return left, right


def test_asof_null_keys_and_ts_never_match(spark, asof_fixture):
    from meta_morph_etl_databricks_spark.operators.asof import asof_join

    left, right = asof_fixture
    got = asof_join(left, right, on=["user_id"], payload=["tag"]).collect()
    assert len(got) == left.count()  # every left row survives exactly once
    by_key = {(r["user_id"], r["ts"]): r for r in got}
    # NULL-keyed left row must NOT pick up the NULL-keyed right row
    assert by_key[(None, _ts(7))]["tag"] is None
    # a NULL-timestamp right row is not "before everything" — no match
    assert by_key[(2, _ts(5))]["tag"] is None
    assert by_key[(2, _ts(5))]["matched_ts"] is None
    # NULL-ts left row survives unmatched
    assert by_key[(1, None)]["tag"] is None
    # duplicate right rows at one (key, ts): exactly one match, no fanout
    assert by_key[(1, _ts(10))]["tag"] in {"a", "b"}
    assert by_key[(1, _ts(10))]["matched_ts"] == _ts(8)


def test_asof_tolerance_voids_stale_matches(spark, asof_fixture):
    from meta_morph_etl_databricks_spark.operators.asof import asof_join

    left, right = asof_fixture
    got = asof_join(
        left, right, on=["user_id"], payload=["tag"], tolerance_seconds=1.0
    ).collect()
    # the ts=10 left row's only candidate is 2s old — voided, row kept
    row = next(r for r in got if r["user_id"] == 1 and r["ts"] == _ts(10))
    assert row["tag"] is None and row["matched_ts"] is None


def test_range_join_null_and_inverted_intervals(spark):
    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [(1, 15), (2, 25), (None, 15), (3, None)], "user_id long, v long"
    )
    right = spark.createDataFrame(
        [
            (1, 10, 20),      # matches user 1 @ 15
            (None, 10, 20),   # NULL key — matches nothing
            (2, None, 30),    # NULL start — matches nothing
            (2, 30, 20),      # inverted interval — matches nothing
        ],
        "user_id long, s long, e long",
    )
    got = range_join(
        left.withColumnRenamed("v", "val"),
        right,
        value_col="val",
        start_col="s",
        end_col="e",
        bucket_width=10,
        on=["user_id"],
    ).collect()
    assert [(r["user_id"], r["val"]) for r in got] == [(1, 15)]


def test_tier_column_nulls_never_reach_top_tier(spark):
    """A group whose aggregate is NULL (no measurable values) must tier
    to NULL — every when() comparison on NULL is NULL, so an unguarded
    chain would drop it into otherwise() and award the TOP tier."""
    from meta_morph_etl_databricks_spark.operators.bucketing import quantile_buckets

    vals = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", None), (3, "g2", None), (4, "g3", 40.0)],
        "id long, g string, v double",
    )
    got = {
        r["id"]: r["tier"]
        for r in quantile_buckets(
            vals, group_key="g", value_col="v",
            probabilities=[0.5], labels=["lo", "hi"], exact=True,
        ).collect()
    }
    assert got[3] is None          # all-NULL group: no tier
    assert got[1] is not None and got[4] is not None


def test_merge_upsert_null_keys_insert_not_match(spark, tmp_path):
    """ANSI MERGE semantics: ON t.k = s.k never matches NULL keys, so a
    NULL-keyed source row INSERTS alongside the NULL-keyed target row
    rather than updating it — same behavior as the reference engine's
    MERGE.  Pinned so nobody "fixes" it with a null-safe equality."""
    from meta_morph_etl_databricks_spark.sources.sinks import merge_upsert

    tgt = str(tmp_path / "t")
    spark.createDataFrame([(1, "x"), (None, "n")], "k long, val string").write.parquet(tgt)
    merge_upsert(
        spark, tgt,
        spark.createDataFrame([(1, "x2"), (None, "n2")], "k long, val string"),
        keys=["k"],
    )
    got = sorted([tuple(r) for r in spark.read.parquet(tgt).collect()], key=str)
    assert got == [(1, "x2"), (None, "n"), (None, "n2")]
