"""Stage-by-stage profile of the minhash band-index chain at sf0.1
(guide §1: isolate with the noop sink, min-of-N same-process timings).

Stages (cumulative — each includes everything before it):
  scan       documents scan through _documents (split-adapted)
  shingle    + explode(shingles(text, 3))
  md5        + base hash (md5 -> conv -> mod P)
  affine+agg + 16 affine derivations + groupBy min agg (the signature)
  bands      + band_key_array + posexplode + sig array (the index rows)
  ckpt       minhash_band_index(...).localCheckpoint(eager=True)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.session import get_spark
from meta_morph_etl_databricks_spark.operators.dedup import (
    _shingle_base_hash,
    band_key_array,
    minhash_params,
    minhash_signatures,
    MINHASH_P,
)
from meta_morph_etl_databricks_spark.operators.incremental import minhash_band_index
from meta_morph_etl_databricks_spark.operators.text import shingles
from meta_morph_etl_databricks_spark.plans.ml_queries import _documents

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    best = None
    for _ in range(N):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:12s} {best:7.3f} s")
    return best


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = _documents(spark, SF_DIR)
    print("docs:", docs.count())

    sh = docs.select(F.col("doc_id"), F.explode(shingles("text", 3)).alias("_sh"))
    print("shingle rows:", sh.count())

    t("scan", lambda: noop(docs))
    t("shingle", lambda: noop(sh))
    based = sh.select("doc_id", _shingle_base_hash(F.col("_sh")).alias("_hv"))
    t("md5", lambda: noop(based))
    sig = minhash_signatures(docs, num_hashes=16)
    t("affine+agg", lambda: noop(sig))
    bi = minhash_band_index(docs, num_hashes=16, bands=4)
    t("bands", lambda: noop(bi))
    t("ckpt", lambda: minhash_band_index(docs, num_hashes=16, bands=4)
        .localCheckpoint(eager=True).unpersist())


if __name__ == "__main__":
    main()
