"""Adversarial streaming semantics: the boundary cases that silently
reshape results at event-pipeline scale.

Window membership at exact boundaries (half-open contracts), session
merging at exactly-gap spacing, NULL event times, and the
dedup-horizon re-admission contract are each pinned here — these are
the semantics a user must be able to rely on when the same builder
runs over 100 TB/day of events, where every boundary case occurs
millions of times per hour.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.streaming.dedup import dedup_stream
from meta_morph_etl_databricks_spark.streaming.windows import (
    session_user_windows,
    tumbling_type_counts,
)


def _ts(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s)


def test_tumbling_window_boundary_is_half_open(spark):
    """An event at exactly the window edge belongs to the NEXT window:
    windows are [start, end).  An off-by-one here double- or
    zero-counts every on-the-hour event (timestamp-rounded feeds make
    those massively overrepresented)."""
    events = spark.createDataFrame(
        [
            (1, _ts(10, 0, 0), "click", 1.0),   # exactly 10:00 → [10:00, 11:00)
            (2, _ts(10, 59, 59), "click", 1.0),  # last second of the window
            (3, _ts(11, 0, 0), "click", 1.0),   # exactly 11:00 → [11:00, 12:00)
        ],
        "user_id int, ts timestamp, event_type string, value double",
    )
    got = {
        (r.window_start, r.n_events)
        for r in tumbling_type_counts(events, width="1 hour").collect()
    }
    assert got == {(_ts(10), 2), (_ts(11), 1)}


def test_session_gap_boundary_merges_exactly_at_gap(spark):
    """Two events exactly `gap` apart DO merge: a new session starts only
    when the inactivity gap is EXCEEDED (`diff > gap`, the classic
    sessionization rule — a session window [first, last+gap) absorbs an
    event landing exactly on its end); one second further and it
    splits.  This is the difference between 'one visit' and 'two
    visits' for every metronomic client (pollers, heartbeats) in the
    corpus — and it is the rule q_events_session's SQL oracle encodes,
    so it must never drift."""
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id int, ts timestamp, value double"
    )
    merged = session_user_windows(
        mk([(1, _ts(10, 0, 0), 1.0), (1, _ts(10, 30, 0), 1.0)]), gap="30 minutes"
    ).collect()
    assert [(r.session_start, r.session_end, r.n_events) for r in merged] == [
        (_ts(10, 0), _ts(11, 0), 2)
    ]

    split = session_user_windows(
        mk([(1, _ts(10, 0, 0), 1.0), (1, _ts(10, 30, 1), 1.0)]), gap="30 minutes"
    ).collect()
    assert sorted((r.session_start, r.session_end, r.n_events) for r in split) == [
        (_ts(10, 0), _ts(10, 30), 1),
        (_ts(10, 30, 1), _ts(11, 0, 1), 1),
    ]


def test_null_event_time_is_dropped_never_misbinned(spark):
    """NULL-ts events are DROPPED by every window builder — explicitly
    (the builders filter, and the oracles carry the matching WHERE ts
    IS NOT NULL) rather than as a side effect of window() derivation.
    They must never be absorbed into a real window, NULL-grouped into a
    phantom window row, or crash the builder.  This was a live oracle
    divergence: DuckDB's time_bucket NULL-groups where Spark drops —
    invisible until the first corpus with unparseable timestamps."""
    events = spark.createDataFrame(
        [(1, _ts(10, 5), "click", 1.0), (2, None, "click", 1.0)],
        "user_id int, ts timestamp, event_type string, value double",
    )
    rows = tumbling_type_counts(events, width="1 hour").collect()
    assert {(r.window_start, r.n_events) for r in rows} == {(_ts(10), 1)}

    sess = session_user_windows(
        events.select("user_id", "ts", "value"), gap="30 minutes"
    ).collect()
    assert {(r.user_id, r.n_events) for r in sess} == {(1, 1)}


def test_dedup_stream_horizon_readmits_after_eviction(spark, tmp_path):
    """The documented dedup_stream contract, run as a REAL two-trigger
    stream: a duplicate inside the watermark horizon is dropped; the
    same key re-arriving AFTER its state was evicted passes through
    (exactly-once-per-horizon, not exactly-once-ever — the honest
    bounded-state trade every 100 TB/day dedup makes)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "k string, ts timestamp, v int"

    # batch 1: key X at 00:00, its duplicate at 00:10 (inside horizon),
    # and a frontier event at 05:00 that advances the watermark to
    # 03:00 (> X's 00:00 + 2h horizon) → X's state evicts after b1.
    spark.createDataFrame(
        [("X", _ts(0, 0), 1), ("X", _ts(0, 10), 2), ("F", _ts(5, 0), 3)], schema
    ).write.parquet(str(src / "b1"))

    got: list = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        out = dedup_stream(stream, keys=["k"], watermark_delay="2 hours")
        q = (
            out.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _bid: got.extend(df.collect()))
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # exactly one X emitted (WHICH of the two intra-batch duplicates is
    # unspecified — micro-batches carry no row order), plus F
    assert sorted(r.k for r in got) == ["F", "X"]
    assert next(r.v for r in got if r.k == "X") in (1, 2)

    # batch 2: X re-arrives at 04:00 — after eviction → re-admitted.
    spark.createDataFrame([("X", _ts(4, 0), 4)], schema).write.parquet(str(src / "b2"))
    run_once()
    assert sorted(r.k for r in got) == ["F", "X", "X"]
    assert ("X", 4) in {(r.k, r.v) for r in got}  # the re-admission


def test_dedup_stream_batch_mode_is_whole_input_horizon(spark):
    """Batch-mode fallback: plain dropDuplicates over the whole input —
    one row per key regardless of spacing."""
    df = spark.createDataFrame(
        [("X", _ts(0, 0), 1), ("X", _ts(23, 0), 2), ("Y", _ts(1, 0), 3)],
        "k string, ts timestamp, v int",
    )
    out = dedup_stream(df, keys=["k"])
    assert out.count() == 2
    assert {r.k for r in out.collect()} == {"X", "Y"}


def test_session_oracle_agrees_with_engine_at_exact_gap(spark):
    """Cross-engine pin of the boundary just fixed: the q_events_session
    DuckDB oracle and session_user_windows must agree on a corpus built
    ENTIRELY of gap-boundary spacings (exactly gap, gap−1s, gap+1s,
    chains of exact gaps).  The oracle originally used `>= gap` where
    the engine merges at `== gap` — invisible on testdata, guaranteed
    divergence on any corpus with metronomic 30-minute clients."""
    import duckdb

    from meta_morph_etl_databricks_spark.plans.registry import ORACLES

    rows = [
        # user 1: chain of exact 30-minute spacings → ONE session
        (1, _ts(10, 0, 0), 1.0),
        (1, _ts(10, 30, 0), 1.0),
        (1, _ts(11, 0, 0), 1.0),
        # user 2: gap+1s → split
        (2, _ts(10, 0, 0), 1.0),
        (2, _ts(10, 30, 1), 1.0),
        # user 3: gap−1s then exact gap → one session of three
        (3, _ts(10, 0, 0), 1.0),
        (3, _ts(10, 29, 59), 1.0),
        (3, _ts(10, 59, 59), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = sorted(
        (r.session_start, r.session_end, r.user_id, r.n_events, r.session_value)
        for r in session_user_windows(df, gap="30 minutes").collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE events (user_id INT, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(ORACLES["q_events_session"]).fetchall())
    con.close()

    assert got == want
    # and the semantics themselves: users 1 and 3 each one session
    per_user = {}
    for _, _, uid, n, _ in got:
        per_user[uid] = per_user.get(uid, 0) + 1
    assert per_user == {1: 1, 2: 2, 3: 1}
