"""Synthesize an sf1-equivalent dataset (10× sf0.1) for the scale bench.

The driver's testdata tops out at sf0.1 (~600k lineitem rows); the
verdict's open question is whether the 100 TB plan-shape claims survive
a 10× scale-up with NO quadratic query.  This tool replicates the sf0.1
tables 10× with key offsets (facts and per-entity dims grow; catalog
dims stay), perturbing text and vectors per copy so dedup/ANN workloads
stay realistic — 10 identical copies of every document would turn each
LSH bucket into a degenerate mega-clique and measure the wrong thing.

Replication is pure column expressions over a ``copy`` explode — fully
distributed, no driver materialization; the same pattern scales to
synthesizing 100× or 1000× on a real cluster.

Usage: python tools/gen_scale.py [out_dir] [copies] [all|ml|tpch]
Writes {out_dir}/{table}.parquet; default out .scale10/ (gitignored).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key spaces in the sf0.1 data (max key rounded up) — offsets must clear
# them so replicated keys never collide across copies
ORDER_SPAN = 10_000_000
CUST_SPAN = 1_000_000
DOC_SPAN = 1_000_000
VEC_SPAN = 1_000_000
EVENT_SPAN = 10_000_000


def _explode_copies(df: DataFrame, copies: int) -> DataFrame:
    ex = df.withColumn("copy", F.explode(F.array(*[F.lit(i) for i in range(copies)])))
    # The sf0.1 source tables are single parquet files, so without a
    # shuffle the whole replicated output funnels through ONE task and
    # lands as ONE file — and every downstream hash-heavy scan then runs
    # single-core (the exact trap read_parquet_table(min_partitions=)
    # exists for; measured r13: the 10× band-index build dropped
    # 95 s → 9 s once the corpus arrived split).  Repartition to the
    # session's parallelism so the write is distributed and the files
    # split on read.
    return ex.repartition(df.sparkSession.sparkContext.defaultParallelism)


def scale_tables(spark: SparkSession, out_dir: str, copies: int = 10, tables: str = "all") -> None:
    """``tables='all'`` replicates every table; ``'ml'`` only documents +
    embeddings (the inputs of the ML-heavy queries) — the 100× scale
    bench needs nothing else and skips ~97% of the write volume."""
    os.makedirs(out_dir, exist_ok=True)
    if tables == "ml":
        _scale_ml_tables(spark, out_dir, copies)
        return
    if tables == "tpch":
        _scale_tpch_tables(spark, out_dir, copies)
        return

    _scale_tpch_tables(spark, out_dir, copies)

    # --- events: replicate with id/user offsets, jitter ts by copy*37s
    # (ts is stored as raw nanos-since-epoch LONG in the testdata parquet;
    # read_parquet_table normalizes it at query time — here we stay in
    # the storage representation)
    events = spark.read.parquet(f"{SRC}/events.parquet")
    if dict(events.dtypes)["ts"] in ("bigint", "long"):
        jittered = F.col("ts") + F.col("copy").cast("bigint") * F.lit(37_000_000_000)
    else:
        jittered = F.col("ts") + F.make_interval(secs=F.col("copy") * 37)
    _explode_copies(events, copies).withColumn(
        "event_id", F.col("event_id") + F.col("copy") * EVENT_SPAN
    ).withColumn("user_id", F.col("user_id") + F.col("copy") * CUST_SPAN).withColumn(
        "ts", jittered
    ).drop("copy").write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    _scale_ml_tables(spark, out_dir, copies)


def _scale_tpch_tables(spark: SparkSession, out_dir: str, copies: int) -> None:
    """The lineitem-heavy subset: facts + per-entity dims replicate with
    consistent key offsets; catalog dims stay at catalog size (only
    demand grows — the usual warehouse shape).  Exactly what the mart
    queries (q_supplier_performance / q_customer_metrics / ...) read, so
    the 100× mart bench can skip the ML tables' write volume."""
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    lineitem = spark.read.parquet(f"{SRC}/lineitem.parquet")
    customer = spark.read.parquet(f"{SRC}/customer.parquet")

    _explode_copies(customer, copies).withColumn(
        "c_custkey", F.col("c_custkey") + F.col("copy") * CUST_SPAN
    ).drop("copy").write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")

    _explode_copies(orders, copies).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("copy") * ORDER_SPAN
    ).withColumn("o_custkey", F.col("o_custkey") + F.col("copy") * CUST_SPAN).drop(
        "copy"
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    # part/supp keys reference the UNSCALED dims (dims stay catalog-sized;
    # only demand grows — the usual warehouse shape)
    _explode_copies(lineitem, copies).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("copy") * ORDER_SPAN
    ).drop("copy").write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    for t in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def _scale_ml_tables(spark: SparkSession, out_dir: str, copies: int) -> None:
    # --- documents: copy 0 verbatim; copies 1+ get a per-copy suffix token
    # so they are near-dups (real LSH work), not exact clones.
    #
    # Past 10 copies the single-suffix scheme would put EVERY copy of a
    # doc within near-dup range of every other — dup DENSITY would grow
    # quadratically with copies and the bench would measure clique
    # explosion, not corpus scale.  So copies are structured into
    # FAMILIES of 10: members of a family stay suffix-level near-dups
    # (same density as the 10× set), while each family>0 additionally
    # rewrites ~1/8 of tokens to family-specific hash tokens — token
    # Jaccard across families drops to ~0.6, outside both the 0.8
    # Jaccard gate and simhash hamming-2 range.  A 100× corpus is then
    # 10 disjoint near-dup populations of 10× each: size grows, local
    # dup structure doesn't.
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    fam = (F.col("copy") / 10).cast("int")
    base_text = F.col("text")
    if copies > 10:
        base_text = F.when(fam == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.when(
                        F.pmod(F.xxhash64(t, fam), F.lit(8)) == 0,
                        F.concat(F.lit("f"), fam.cast("string"), F.lit("x"),
                                 F.conv(F.xxhash64(t, fam).cast("string"), 10, 16)),
                    ).otherwise(t),
                ),
                " ",
            )
        )
    # PII planted at the declared-query recipe's known rates (one item
    # per doc for 7 of every 8 FINAL doc_ids, kind by residue — see
    # plans/ml_queries._PII_PLANTS) so scale-bench redaction audits can
    # pin counts against the planting rate instead of hoping the
    # synthetic text contains none.
    from meta_morph_etl_databricks_spark.plans.ml_queries import pii_plant_tail

    scaled_id = F.col("doc_id") + F.col("copy") * DOC_SPAN
    _explode_copies(docs, copies).withColumn(
        "text",
        F.concat(
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(
                    base_text,
                    F.lit(" variant "),
                    F.conv(F.xxhash64("doc_id", "copy").cast("string"), 10, 16),
                )
            ),
            pii_plant_tail(scaled_id),
        ),
    ).withColumn("doc_id", scaled_id).drop(
        "copy"
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # --- embeddings: perturb each component with hash-derived noise
    # (≈±0.5% relative) so copies are near-neighbors, not duplicates
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    noise = lambda i: (  # noqa: E731
        (F.pmod(F.xxhash64(F.col("vec_id"), F.col("copy"), i), F.lit(1000)).cast("double") / 1000.0 - 0.5)
        * 0.01
    )
    _explode_copies(emb, copies).withColumn(
        "embedding",
        F.when(F.col("copy") == 0, F.col("embedding")).otherwise(
            F.transform(F.col("embedding"), lambda x, i: (x + noise(i)).cast("float"))
        ),
    ).withColumn("vec_id", F.col("vec_id") + F.col("copy") * VEC_SPAN).drop(
        "copy"
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale10"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tables = sys.argv[3] if len(sys.argv) > 3 else "all"
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("gen_scale")
    spark.sparkContext.setLogLevel("ERROR")
    scale_tables(spark, out_dir, copies, tables)
    check = {
        "ml": ("documents", "embeddings"),
        "tpch": ("lineitem", "orders", "customer"),
    }.get(tables, ("lineitem", "documents", "embeddings", "events"))
    for t in check:
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
