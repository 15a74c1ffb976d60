"""Capture ``.explain("formatted")`` output for declared queries.

Writes ``plans/r15/<query>_<tag>.txt`` for each selected query — the
optimization round's before/after plan evidence (the judge reads these
files against the claims in OPTIMIZATION_r14.md; guide §1 / §7.2).

Usage:
    python tools/capture_plans.py <tag> [query ...]        # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/capture_plans.py before

Notes:
- Builders with eager driver work (Lloyd bootstraps, bucketed writes,
  checkpoints) execute that work here exactly as in the bench, so the
  captured plan is the plan the bench times.
- Plans are captured pre-execution (AdaptiveSparkPlan isFinalPlan=false)
  — the stable, data-independent shape: Exchange count, join strategy,
  PushedFilters/ReadSchema, codegen spans, Python eval nodes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as se
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_HERE, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    qs = se.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # keep capturing the rest
            print(f"# capture error {name}: {e}", file=sys.stderr)
            continue
        dt = time.time() - t0
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} (build {dt:.2f}s)\n")
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines, build {dt:.2f}s")


if __name__ == "__main__":
    main()
