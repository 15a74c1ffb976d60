"""Scale bench: the 5 hottest queries at sf0.1 vs the 10× synthetic
(.scale10, built by tools/gen_scale.py), reporting wall-clock ratios.

The claim under test (VERDICT r2, next-round #2): every hot plan is
banded/bucketed/broadcast — scaling the data 10× should scale time
near-linearly (≤ ~10–12×), with no quadratic blow-up.  Candidate pairs
in the LSH/banding queries DO grow superlinearly when near-dup density
rises (the 10× corpus is deliberately near-dup-rich), so pair COUNTS are
printed alongside times — a time ratio tracking the output ratio is
linear work per pair, not a broken plan.

Writes BENCH_SCALE.json at the repo root.

Usage: python tools/bench_scale.py [scale10_dir] [out_json] [scale100_dir] [scale100_tpch_dir]

When ``scale100_dir`` is given (built by ``gen_scale.py <dir> 100 ml``),
the ML-heavy queries gain a scale100 column — documents/embeddings only,
family-structured so dup DENSITY stays at the 10× level while corpus
SIZE grows another 10× (see gen_scale.py).  Expected shape: time_100
tracks rows_100 (pair-output queries) or stays ~linear in input (fixed-k
queries); quadratic would be ~100× the sf0.1 time with flat output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT = [
    "q_dedup_simhash_hamming",
    "q_similarity_ivf_topk",
    "q_customer_sales_report",
    "q_corpus_curation",
    "q_dedup_ngram_jaccard",
    "q_supplier_performance",
    "q_customer_metrics",
]
# queries whose inputs are documents/embeddings only — eligible for the
# scale100 pass over the ML-table 100× dir
ML_ONLY = {
    "q_dedup_simhash_hamming",
    "q_similarity_ivf_topk",
    "q_corpus_curation",
    "q_dedup_ngram_jaccard",
}
# the lineitem-heavy marts — eligible for the scale100 pass over the
# TPC-H-table 100× dir (gen_scale.py mode 'tpch')
TPCH_HEAVY = {
    "q_supplier_performance",
    "q_customer_metrics",
    "q_customer_sales_report",
}


def bench_ivf_indexed(spark, sf_dir: str) -> dict:
    """Auto-sized IVF with the index/serve split: seed-rule codebook at
    nlist=√n, assignment kernel auto-picked (BLAS matmul past 64 lists),
    index persisted once, then one 5-query serve batch at nprobe=5% of
    the list space.  build_sec is the amortized cost; probe_sec is the
    per-batch serve cost the √n rule keeps sublinear."""
    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators.similarity import (
        auto_nlist,
        auto_nprobe,
        ivf_centroids,
        ivf_index,
        ivf_topk_indexed,
    )
    from meta_morph_etl_databricks_spark.plans.ml_queries import _embeddings

    emb = _embeddings(spark, sf_dir)
    n = emb.count()
    nlist = auto_nlist(n)
    nprobe = auto_nprobe(nlist)
    cents = ivf_centroids(emb, k=nlist)
    t0 = time.time()
    idx = ivf_index(emb, cents).persist()
    idx.count()
    build = time.time() - t0
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    t0 = time.time()
    rows = ivf_topk_indexed(idx, q, cents, k=10, nprobe=nprobe, exclude_self=True).count()
    probe = time.time() - t0
    idx.unpersist()
    return {
        "n": n,
        "nlist": nlist,
        "nprobe": nprobe,
        "build_sec": round(build, 2),
        "probe_sec": round(probe, 2),
        "rows": rows,
    }


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale10"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE.json"
    scale100_dir = sys.argv[3] if len(sys.argv) > 3 else None
    scale100_tpch_dir = sys.argv[4] if len(sys.argv) > 4 else None
    base_dir = "/root/testdata/sf0.1"

    import __spark_entry__ as se
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {k: v for k, v in se.queries().items() if k in HOT}

    # warm JVM/codegen/Arrow on the small sf so the timed runs measure
    # distributed execution, not compilation
    for fn in qs.values():
        fn(spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict] = {}
    for name, fn in qs.items():
        rec: dict = {}
        passes = [("sf0.1", base_dir, 2), ("scale10", scale_dir, 2)]
        if scale100_dir and name in ML_ONLY:
            passes.append(("scale100", scale100_dir, 1))  # single pass: minutes-long
        if scale100_tpch_dir and name in TPCH_HEAVY:
            passes.append(("scale100", scale100_tpch_dir, 1))
        for label, d, n_passes in passes:
            best, rows = None, None
            for _ in range(n_passes):  # min of N to shave host-throttle noise
                t0 = time.time()
                rows = fn(spark, d).count()
                t = time.time() - t0
                best = t if best is None else min(best, t)
            rec[label] = {"sec": round(best, 2), "rows": rows}
        rec["time_ratio"] = round(rec["scale10"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9), 2)
        rec["rows_ratio"] = round(rec["scale10"]["rows"] / max(rec["sf0.1"]["rows"], 1), 2)
        if "scale100" in rec:
            rec["time_ratio_100"] = round(rec["scale100"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9), 2)
            rec["rows_ratio_100"] = round(rec["scale100"]["rows"] / max(rec["sf0.1"]["rows"], 1), 2)
        results[name] = rec
        msg = (f"{name}: {rec['sf0.1']['sec']}s -> {rec['scale10']['sec']}s "
               f"({rec['time_ratio']}x time, {rec['rows_ratio']}x rows)")
        if "scale100" in rec:
            msg += (f" -> {rec['scale100']['sec']}s at 100x "
                    f"({rec['time_ratio_100']}x time, {rec['rows_ratio_100']}x rows)")
        print(msg)

    # --- IVF build/serve split with auto sizing (VERDICT r4 #2): the
    # declared q_similarity_ivf_topk row above keeps the fixed nlist=16
    # fused path for cross-round continuity; this supplementary record
    # measures the production shape — index built ONCE (O(n·nlist),
    # amortized across query batches) and the per-batch serve cost,
    # which with nlist=√n and a fixed probe fraction is what must stay
    # sublinear as the corpus grows.
    ivf_rec: dict[str, dict] = {}
    for label, d in [("sf0.1", base_dir), ("scale10", scale_dir)] + (
        [("scale100", scale100_dir)] if scale100_dir else []
    ):
        ivf_rec[label] = bench_ivf_indexed(spark, d)
        r = ivf_rec[label]
        print(
            f"ivf_indexed_auto[{label}]: n={r['n']} nlist={r['nlist']} nprobe={r['nprobe']} "
            f"build={r['build_sec']}s probe={r['probe_sec']}s rows={r['rows']}"
        )

    payload = {
        "data_scale_factor": 10,
        "scale100": bool(scale100_dir),
        "queries": results,
        "ivf_indexed_auto": ivf_rec,
        "note": "time_ratio <= ~12 (or tracking rows_ratio for pair-output "
                "queries) = near-linear; >> that = quadratic plan",
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
