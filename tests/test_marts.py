"""Mart pipeline tests: shape, PK uniqueness (the reference's own gate,
SURVEY.md §5.1), and load-bearing semantics quirks."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.plans.marts import (
    customer_metrics,
    customer_sales_report,
    product_performance,
    supplier_performance,
)


def test_supplier_performance_shape(spark, sf_dir):
    df = supplier_performance(spark, sf_dir)
    rows = df.collect()
    # every supplier appears exactly once (PK gate on supplier_id)
    n_suppliers = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert len(rows) == n_suppliers
    assert df.columns == [
        "supplier_id",
        "supplier_name",
        "total_revenue",
        "total_products_sold",
        "total_stock_sold",
        "top_product",
    ]
    # theta-in-ON: suppliers with only returned lines still appear with 0s
    assert all(r.total_revenue >= 0 for r in rows)


def test_supplier_performance_excludes_returned(spark, sf_dir):
    df = supplier_performance(spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
    )
    got = {r.supplier_id: r.total_products_sold for r in df.collect()}
    for r in expected.collect():
        assert got[r.l_suppkey] == r.n


def test_product_performance_pk_and_status(spark, sf_dir):
    df = product_performance(spark, sf_dir)
    assert df.groupBy("product_id").count().filter("count > 1").isEmpty()
    statuses = {r.stock_level_status for r in df.select("stock_level_status").distinct().collect()}
    assert statuses <= {"Below Reorder Level", "Sufficient Stock"}


def test_customer_metrics_null_groups(spark, sf_dir):
    df = customer_metrics(spark, sf_dir)
    # every customer keeps a row (left join), and customers with no
    # orders (if any at this SF) get zeroed money columns (A5)
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert df.count() == n_customers
    no_sales = df.filter(F.col("last_purchase_date").isNull())
    for r in no_sales.collect():
        assert r.expenditure == 0.0 and r.total_orders == 0.0


def test_customer_sales_report_tiers(spark, sf_dir):
    df = customer_sales_report(spark, sf_dir)
    tiers = {r.loyalty_tier for r in df.select("loyalty_tier").distinct().collect()}
    assert tiers == {"GOLD", "SILVER", "BRONZE"}
    # note: the synthetic lineitem has duplicate (l_orderkey, l_linenumber)
    # pairs, so sale_id is NOT unique here — PK gating is exercised by the
    # quality layer (C3), not asserted on this mart.
    assert df.filter(F.col("price").isNull() | F.col("sale_amount").isNull()).isEmpty()


def test_customer_sales_report_approx_quantile_path(spark, sf_dir):
    """The scale path (approxQuantile, relErr 0.01 — no global sort)
    must produce the same report shape and nearly the same tier split as
    the exact path: at relErr 0.01 at most ~2% of customers may straddle
    a cut differently."""
    exact = customer_sales_report(spark, sf_dir, exact_quantiles=True)
    approx = customer_sales_report(spark, sf_dir, exact_quantiles=False)
    assert exact.columns == approx.columns
    assert exact.count() == approx.count()
    n_cust = exact.select("customer_id").distinct().count()
    diff = (
        exact.select("customer_id", "loyalty_tier")
        .distinct()
        .subtract(approx.select("customer_id", "loyalty_tier").distinct())
        .count()
    )
    assert diff <= max(2, int(0.03 * n_cust)), f"{diff}/{n_cust} customers changed tier"
