"""Profile the persisted-index serve-latency floor (r12 verdict task 1).

Every serve against the band index pays ~1.5–2.5 s at sf0.1 regardless
of corpus size (BENCH_SCALE ``incremental_partitioned``): fine amortized
over batch increments, but the dominant term for a 32-doc increment.
This tool splits ONE serve into its terms so the floor is attributed,
not guessed:

- ``open_live``     — pointer + meta + rows sidecar reads (driver py4j)
- ``band_touch``    — banding the increment (persist) + touched-pfx
                      collect: the FIRST Spark job of the serve
- ``tombstones``    — takedown sidecar read (driver py4j)
- ``pruned_plan``   — brace-glob pruned parquet read plan build (JVM
                      file listing happens here, lazily-triggered later)
- ``policy_plan``   — incremental_dedup plan assembly (pure driver when
                      the sidecar supplies build params)
- ``compute``       — the ``accepted.count()`` action: candidate join +
                      verify over the pruned buckets (Spark jobs)

plus isolated micro-timings of the sidecar reads themselves
(``live_index`` / ``_tombstone_list`` in a loop) so "is it the tiny
files?" has a direct answer.

Usage::

    python tools/profile_serve.py [corpus_docs] [passes]
                                  [sf_dir=/root/testdata/sf0.1]

Prints one JSON line; a summary row belongs in BENCH_SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators import index_store as ix
    from meta_morph_etl_databricks_spark.plans.ml_queries import _documents
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    docs = _documents(spark, sf_dir).limit(corpus_docs + 32).cache()
    cut = (
        docs.orderBy(F.col("doc_id").desc())
        .limit(32)
        .agg(F.min("doc_id"))
        .first()[0]
    )
    corpus = docs.where(F.col("doc_id") < cut)
    increment = docs.where(F.col("doc_id") >= cut).cache()
    n_inc = increment.count()

    idx_dir = tempfile.mkdtemp(prefix="serve_prof_")
    out: dict = {
        "metric": "serve_floor_profile",
        "corpus_docs": corpus.count(),
        "increment_docs": n_inc,
        "passes": passes,
        "sf_dir": sf_dir,
    }
    try:
        t0 = time.time()
        meta = ix.create_band_index(corpus, idx_dir)
        out["index_build_sec"] = round(time.time() - t0, 2)
        out["n_buckets"] = meta["n_buckets"]

        # ---- isolated sidecar-read micro-timings (50 reps each)
        live, _ = ix.live_index(spark, idx_dir)
        reps = 50
        t0 = time.time()
        for _ in range(reps):
            ix.live_index(spark, idx_dir)
        out["live_index_ms"] = round((time.time() - t0) / reps * 1000, 2)
        t0 = time.time()
        for _ in range(reps):
            ix._tombstone_list(spark, live)
        out["tombstone_list_ms"] = round((time.time() - t0) / reps * 1000, 2)

        # ---- phase-traced serves (append=False mirrors BENCH_SCALE)
        runs = []
        for _ in range(passes):
            trace: dict = {}
            t0 = time.time()
            res = ix.serve_incremental_dedup(
                increment, idx_dir, append=False, trace=trace
            )
            trace["_plan_total"] = time.time() - t0
            t0 = time.time()
            trace["compute"] = None
            n = res.accepted.count()
            trace["compute"] = time.time() - t0
            trace["_total"] = trace["_plan_total"] + trace["compute"]
            trace["_accepted"] = n
            runs.append({k: round(v, 4) if isinstance(v, float) else v
                         for k, v in trace.items()})
        out["runs"] = runs
        keys = [k for k in runs[0] if k != "_accepted"]
        # min-of-passes per phase: the floor, shorn of host-throttle bursts
        out["floor"] = {k: round(min(r[k] for r in runs), 3) for k in keys}
        out["mean"] = {
            k: round(sum(r[k] for r in runs) / len(runs), 3) for k in keys
        }
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
