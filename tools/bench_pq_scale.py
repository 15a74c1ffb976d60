"""PQ build/serve scale record — appended into BENCH_SCALE.json as
``pq_adc``.

The claim under test: PQ's costs are one linear ENCODE pass at ingest
(integer argmin per row, map-only — the index build) and an ADC serve
scan that reads m bytes per corpus vector instead of the 512-byte
float column (the 100 TB point: the candidate scan is bytes-bound, so
64× fewer bytes is 64× less I/O at constant kernel cost), plus a
re-rank that fetches full vectors for only k·factor rows per query.
Build and serve should both track corpus size ~linearly; the rerank
stage should stay ~flat (fixed candidate count per query).

Usage: python tools/bench_pq_scale.py [scale10_ml_dir] [scale100_ml_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, KSUB = 8, 16  # 64-dim → 8-dim subspaces, 1 byte/subspace → 8 B/vector


def bench_pq(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators.quantize import (
        pq_adc_topk,
        pq_codebooks_from_codes,
        pq_encode,
        pq_topk_rerank,
        quantize_int8,
    )
    from meta_morph_etl_databricks_spark.plans.ml_queries import _embeddings

    emb = _embeddings(spark, sf_dir)
    n = emb.count()
    codes = quantize_int8(emb).select("vec_id", "q_vec")
    cb = pq_codebooks_from_codes(codes, m=M, ksub=KSUB)
    t0 = time.time()
    enc = pq_encode(codes, cb).persist()
    enc.count()
    build = time.time() - t0
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    t0 = time.time()
    adc_rows = pq_adc_topk(enc, q, cb, k=10, exclude_self=True).count()
    serve = time.time() - t0
    t0 = time.time()
    rr_rows = pq_topk_rerank(
        emb, q, cb, encoded=enc, k=10, rerank_factor=5, exclude_self=True
    ).count()
    rerank = time.time() - t0
    enc.unpersist()
    return {
        "n": n,
        "m": M,
        "ksub": KSUB,
        "bytes_per_vec": M,
        "build_sec": round(build, 2),
        "serve_sec": round(serve, 2),
        "rerank_sec": round(rerank, 2),
        "adc_rows": adc_rows,
        "rerank_rows": rr_rows,
    }


def main() -> None:
    scale10 = sys.argv[1] if len(sys.argv) > 1 else ".scale10"
    scale100 = sys.argv[2] if len(sys.argv) > 2 else None
    out_json = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SCALE.json"

    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("bench_pq_scale")
    spark.sparkContext.setLogLevel("ERROR")

    bench_pq(spark, "/root/testdata/sf0.001")  # warm codegen/Arrow

    rec: dict[str, dict] = {}
    for label, d in [("sf0.1", "/root/testdata/sf0.1"), ("scale10", scale10)] + (
        [("scale100", scale100)] if scale100 else []
    ):
        rec[label] = bench_pq(spark, d)
        r = rec[label]
        print(
            f"pq_adc[{label}]: n={r['n']} build={r['build_sec']}s "
            f"serve={r['serve_sec']}s rerank={r['rerank_sec']}s"
        )

    payload = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            payload = json.load(f)
    payload["pq_adc"] = rec
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"updated {out_json} (pq_adc)")


if __name__ == "__main__":
    main()
