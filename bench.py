"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
wall-clock seconds.

Each query is forced with a cheap count() action (no driver collect of
full results — we measure the distributed plan, not toPandas transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as se
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = se.queries()

    timings: dict[str, float] = {}
    # warm-up: JVM, codegen, broadcast + shuffle infra on a tiny but
    # plan-shaped query (join + agg + window) so the first timed query
    # doesn't absorb one-time startup costs
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    try:
        next(iter(qs.values()))(spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep benching the rest
            timings[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    ok = [v for v in timings.values() if v >= 0]
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    print(
        json.dumps(
            {
                "metric": "total_wall_clock_all_queries",
                "value": round(sum(ok), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
