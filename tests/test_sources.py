from __future__ import annotations

import os

from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.sources import (
    dual_write,
    merge_upsert,
    read_csv_positional,
    read_json_rows,
    write_parquet,
)


def test_read_csv_positional(spark, tmp_path):
    # human-styled headers are discarded; contract is column ORDER (P2)
    p = tmp_path / "feed.csv"
    p.write_text("Supplier Id,Supplier Name,Contact,Region\n s1 ,Acme,555,EU\ns2,Bolt,666,NA\n")
    df = read_csv_positional(spark, str(p), ["supplier_id", "supplier_name", "contact_details", "region"])
    assert df.columns == ["supplier_id", "supplier_name", "contact_details", "region"]
    rows = df.orderBy("supplier_id").collect()
    assert rows[1].supplier_name == "Bolt"


def test_read_json_rows(spark):
    df = read_json_rows(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}], ["id", "label"])
    assert df.columns == ["id", "label"] and df.count() == 2


def test_dual_write_and_history(spark, tmp_path):
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    raw = str(tmp_path / "raw")
    hist = str(tmp_path / "legacy")
    dual_write(df, raw, hist, day_dt="2001-08-01")
    dual_write(df, raw, hist, day_dt="2001-08-02")
    assert spark.read.parquet(raw).count() == 5  # snapshot overwritten
    h = spark.read.parquet(hist)
    assert h.count() == 10  # history appended
    assert {str(r.day_dt) for r in h.select("day_dt").distinct().collect()} == {"2001-08-01", "2001-08-02"}
    # day_dt is a real partition column → partition pruning on publish (C7)
    assert os.path.isdir(f"{hist}/day_dt=2001-08-01")


def test_merge_upsert(spark, tmp_path):
    target_path = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    write_parquet(base, target_path)
    source = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    merge_upsert(spark, target_path, source, keys=["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(target_path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # idempotent under retry (C5 requirement, SURVEY.md §7.3)
    merge_upsert(spark, target_path, source, keys=["k"])
    assert spark.read.parquet(target_path).count() == 3


def test_merge_upsert_first_load(spark, tmp_path):
    target_path = str(tmp_path / "fresh")
    source = spark.createDataFrame([(1, "a")], ["k", "v"])
    merge_upsert(spark, target_path, source, keys=["k"])
    assert spark.read.parquet(target_path).count() == 1
