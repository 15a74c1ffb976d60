"""End-to-end daily pipeline: ingest → marts → upsert → publish over a
tmp base_dir, plus idempotent re-run and backfill semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.plans.pipeline import run_daily


@pytest.fixture(scope="module")
def pipeline_run(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("daily"))
    stats = run_daily(spark, sf_dir, base, day="2001-08-02")
    return base, stats


def test_all_stages_produce_rows(pipeline_run):
    base, stats = pipeline_run
    for key in (
        "supplier",
        "orders",
        "mart.supplier_performance",
        "mart.customer_metrics",
        "mart.customer_sales_report",
        "published.product_performance",
        "current.customer_metrics",
    ):
        assert stats[key] > 0, key


def test_history_and_marts_are_day_partitioned(spark, pipeline_run):
    base, _ = pipeline_run
    hist = spark.read.parquet(f"{base}/history/orders")
    assert hist.select("day_dt").distinct().collect()[0][0].isoformat() == "2001-08-02"
    mart = spark.read.parquet(f"{base}/marts/supplier_performance")
    assert "day_dt" in mart.columns


def test_rerun_same_day_is_idempotent(spark, sf_dir, pipeline_run):
    base, stats = pipeline_run
    stats2 = run_daily(spark, sf_dir, base, day="2001-08-02")
    assert stats2 == stats  # dynamic overwrite: same day replaces itself
    # history still holds exactly one copy of the day
    hist = spark.read.parquet(f"{base}/history/orders")
    assert hist.count() == stats["orders"]


def test_backfill_second_day_appends_partition(spark, sf_dir, pipeline_run):
    base, stats = pipeline_run
    run_daily(spark, sf_dir, base, day="2001-08-03", publish=False)
    hist = spark.read.parquet(f"{base}/history/orders")
    days = {r[0].isoformat() for r in hist.select("day_dt").distinct().collect()}
    assert days == {"2001-08-02", "2001-08-03"}
    assert hist.count() == 2 * stats["orders"]
    # the current table merged (same customer ids) → count unchanged
    cur = spark.read.parquet(f"{base}/current/customer_metrics")
    assert cur.count() == stats["current.customer_metrics"]


def test_publish_layer_holds_single_day_slice(spark, pipeline_run):
    base, stats = pipeline_run
    rep = spark.read.parquet(f"{base}/reporting/supplier_performance")
    assert rep.count() == stats["published.supplier_performance"]
    assert rep.filter(F.col("day_dt") != F.to_date(F.lit("2001-08-02"))).count() == 0
