"""Job-count + wall-clock profile of one q_embed_near_dup_lsh build
(construction) and its arm actions at a given sf dir — the r15
measurement harness for VERDICT item 1 (jobs/build target).

Usage: python tools/profile_embed_build.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.plans.ml_queries import (
        q_embed_near_dup_lsh,
    )
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("profile_embed_build")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: one full build+consume so codegen/readers are hot
    q_embed_near_dup_lsh(spark, sf_dir).count()

    js = spark._jsparkSession.sparkContext().statusTracker()

    def job_count() -> int:
        # allJobIds via the JVM tracker — counts every job submitted so far
        return len(js.getJobIdsForGroup(None))

    for p in range(passes):
        j0 = job_count()
        t0 = time.time()
        df = q_embed_near_dup_lsh(spark, sf_dir)
        tb = time.time() - t0
        jb = job_count() - j0
        arms = {}
        for arm in ("lsh", "semantic2", "sem_inc", "retract"):
            ja = job_count()
            ta = time.time()
            df.filter(F.col("variant") == arm).count()
            arms[arm] = (round(time.time() - ta, 3), job_count() - ja)
        jt = job_count() - j0
        print(
            f"pass {p}: build {tb:.3f}s/{jb}j  arms "
            + "  ".join(f"{k} {v[0]}s/{v[1]}j" for k, v in arms.items())
            + f"  total_jobs {jt}"
        )


if __name__ == "__main__":
    main()
