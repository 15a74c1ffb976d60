"""Phase-by-phase wall-clock + job-count profile of the two minhash-slot
builds (q_dedup_ngram_jaccard, q_corpus_curation) at a given sf dir —
the r15 measurement harness for VERDICT item 4 (minhash chain floor).

Replicates each builder's construction steps with timers between the
materialization points so the `_build` seconds decompose into: chain
materialization, second-pass scoring, union-find/probe, and pure driver
plan-assembly.

Usage: python tools/profile_dedup_build.py [sf_dir] [passes]
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

    from meta_morph_etl_databricks_spark.session import get_spark
    from meta_morph_etl_databricks_spark.operators import dedup as D
    from meta_morph_etl_databricks_spark.operators.components import (
        connected_components,
    )
    from meta_morph_etl_databricks_spark.operators.incremental import (
        incremental_dedup,
        minhash_band_index,
    )
    from meta_morph_etl_databricks_spark.plans import ml_queries as M
    from meta_morph_etl_databricks_spark.sources.scans import read_parquet_table

    spark = get_spark("profile_dedup_build")
    spark.sparkContext.setLogLevel("ERROR")
    js = spark._jsparkSession.sparkContext().statusTracker()

    def jobs() -> int:
        return len(js.getJobIdsForGroup(None))

    # warm both
    M.q_dedup_ngram_jaccard(spark, sf_dir).count()
    M.q_corpus_curation(spark, sf_dir).count()

    NH, NB = M._NUM_HASHES, M._BANDS

    for p in range(passes):
        print(f"--- pass {p}: q_dedup_ngram_jaccard ---")
        docs = M._documents(spark, sf_dir)
        t0, j0 = time.time(), jobs()
        cands = D.minhash_lsh_candidates(docs, num_hashes=NH, bands=NB).localCheckpoint(
            eager=True
        )
        t1, j1 = time.time(), jobs()
        scored = D.ngram_jaccard_pairs(
            docs, threshold=-1.0, candidates=cands, prune_docs=True
        ).localCheckpoint(eager=True)
        t2, j2 = time.time(), jobs()
        comp = connected_components(scored.where(F.col("jaccard") >= 0.2), id_a="id_a", id_b="id_b")
        t3, j3 = time.time(), jobs()
        print(
            f"  cands ckpt {t1 - t0:.3f}s/{j1 - j0}j  scored ckpt {t2 - t1:.3f}s/{j2 - j1}j"
            f"  components {t3 - t2:.3f}s/{j3 - j2}j  total {t3 - t0:.3f}s/{j3 - j0}j"
        )

        print(f"--- pass {p}: q_corpus_curation ---")
        t0, j0 = time.time(), jobs()
        banded = minhash_band_index(docs, num_hashes=NH, bands=NB).localCheckpoint(
            eager=True
        )
        t1, j1 = time.time(), jobs()
        surviving = D.curate_corpus(
            docs,
            min_quality=M._CUR_MINQ,
            jaccard_threshold=M._CUR_JT,
            num_hashes=NH,
            bands=NB,
            _banded=banded,
        )
        t2, j2 = time.time(), jobs()
        hi = read_parquet_table(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0] or 0
        t3, j3 = time.time(), jobs()
        cuts = sorted({hi // 3, (2 * hi) // 3, hi + 1})
        meta = {"num_hashes": NH, "bands": NB}
        accepted = None
        lo = None
        for cut in cuts:
            cond = (F.col("doc_id") < cut) if lo is None else (
                (F.col("doc_id") >= lo) & (F.col("doc_id") < cut)
            )
            res = incremental_dedup(
                docs.where(cond),
                banded.where(F.col("doc_id") < (lo if lo is not None else 0)),
                num_hashes=NH,
                bands=NB,
                est_threshold=M._INC_T,
                index_meta=meta,
                _banded=banded.where(cond),
            )
            accepted = res.accepted if accepted is None else accepted.unionByName(res.accepted)
            lo = cut
        t4, j4 = time.time(), jobs()
        print(
            f"  banded ckpt {t1 - t0:.3f}s/{j1 - j0}j  curate-plan {t2 - t1:.3f}s/{j2 - j1}j"
            f"  max probe {t3 - t2:.3f}s/{j3 - j2}j  inc-plan {t4 - t3:.3f}s/{j4 - j3}j"
            f"  total {t4 - t0:.3f}s/{j4 - j0}j"
        )


if __name__ == "__main__":
    main()
