"""The four derived-mart pipelines (SURVEY.md §1.4, §3.1), re-expressed
over the TPC-H-ish testdata star schema per the FIXTURES.md §2 mapping:

    suppliers → supplier, products → part, customers → customer,
    sales → orders ⨝ lineitem, order_status 'Cancelled' → l_returnflag 'R'
    (line grain) / o_orderstatus 'P' (order grain),
    payment_mode → o_orderpriority, DAY_DT/current_date → fixed AS_OF.

Semantics mirror the reference tasks exactly (file:line cited per
pipeline) including the load-bearing quirks (SURVEY.md §7.1): theta
predicates inside left-join ON clauses, count(col) vs count(*),
coalesce-to-zero for NULL groups, deterministic window tie-breaks, and
NULLS FIRST ordering in the payment-mode rank.

All money math is decimal-exact (functions.scalars) so results are
bit-stable under any partitioning and identical to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import MONEY, dec, money_round
from ..operators.joins import broadcast_dim, theta_left_join
from ..sources.scans import read_parquet_table
from .registry import register

# Fixed "as of" date: one day past the testdata's max o_orderdate
# (2001-08-01).  The reference uses current_date() everywhere
# (m_customer_metrics_task.py:163-170); a pinned as-of makes runs
# reproducible and oracle-comparable (SURVEY.md §7.3 nondeterminism risk).
AS_OF = "2001-08-02"
ACTIVE_WINDOW_DAYS = 150

_REV = "cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))"


def supplier_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors m_supplier_performance_task.py:38-194.

    supplier ⟕ lineitem with the 'Cancelled' theta IN THE ON CLAUSE (J2,
    returnflag 'R' = returned ≈ cancelled), per-supplier revenue/count
    aggregates with NULL-group zeroing (A1/A2/A5), and the top-selling
    product via row_number top-1 (W2/C1) with a deterministic tie-break
    the reference lacks (orderBy desc(revenue) only → we add name/key).

    Scale: lineitem is never shuffled at fact grain — the supplier and
    part sides are broadcast; each aggregation branch shuffles only its
    map-side-combined partials, on (suppkey) / (suppkey, partname)
    respectively (one Exchange per branch; see the inline A/B note).
    """
    supplier = read_parquet_table(spark, sf_dir, "supplier")
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")
    part = read_parquet_table(spark, sf_dir, "part")

    # Scale plan: aggregate BELOW the outer join.  A left join that
    # preserves the small dimension side cannot broadcast (the build side
    # would be the 100 TB fact), so instead the fact is filtered by the
    # theta predicate and partially aggregated map-side first; the tiny
    # per-supplier aggregate then broadcast-joins back to the dimension.
    # Equivalent to theta-in-ON + agg because the group keys come from
    # the preserved side only and NULL groups coalesce to zero (A5).
    qualified = lineitem.filter(F.col("l_returnflag") != "R").withColumn("rev", F.expr(_REV))

    # ONE aggregation per branch (r14, guide §2.3/§2.4 — measured, not
    # assumed): an intermediate (suppkey, partkey) pre-aggregate shared
    # by both branches sounds like it halves fact I/O, but Catalyst
    # plans TWO narrow-projection fact scans regardless (column pruning
    # specializes each branch's copy, so ReuseExchange can't fire), and
    # the regroup just adds an Exchange per branch.  A/B at sf0.1:
    # two-stage 1.69 s vs direct 1.48 s, rows identical (exceptAll both
    # ways empty; decimal sums/counts are associative so any regrouping
    # is bit-identical — oracle-hash green).  At scale the direct form
    # strictly dominates too: each branch's shuffle carries map-side-
    # combined partials at its FINAL grain (per-supplier ints; per
    # (supplier, part-name) partials), never an extra intermediate
    # shuffle.  The true single-scan form (lazy localCheckpoint of the
    # pre-aggregate) A/B'd worse still (1.53 s) — materialization costs
    # more than the pruned (≤5-column) second scan saves, locally and
    # at cluster scale.
    agg = qualified.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        money_round(F.sum("rev")).alias("total_revenue"),
        F.count("l_orderkey").alias("total_products_sold"),
        F.sum("l_quantity").cast("double").alias("total_stock_sold"),
    )

    # Top product: names attached via a broadcast BEFORE the aggregate,
    # grouped by NAME directly — the reference groups by name, and
    # distinct parts can share one (m_supplier_performance_task.py:
    # 132-145).  Map-side combine bounds the shuffle at the distinct
    # (supplier, name) pairs per task.
    prod_rev = (
        qualified.join(broadcast_dim(part.select("p_partkey", "p_name")), qualified["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.col("l_suppkey").alias("s_suppkey"), "p_name")
        .agg(money_round(F.sum("rev")).alias("product_revenue"))
    )
    w = Window.partitionBy("s_suppkey").orderBy(F.desc("product_revenue"), F.asc("p_name"))
    top = (
        prod_rev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("s_suppkey", F.col("p_name").alias("top_product"))
    )

    return (
        supplier.select("s_suppkey", "s_name")
        .join(broadcast_dim(agg), "s_suppkey", "left")
        .join(broadcast_dim(top), "s_suppkey", "left")
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            money_round(F.coalesce(F.col("total_revenue"), F.lit(0))).alias("total_revenue"),
            F.coalesce(F.col("total_products_sold"), F.lit(0)).alias("total_products_sold"),
            F.coalesce(F.col("total_stock_sold"), F.lit(0)).cast("double").alias("total_stock_sold"),
            "top_product",
        )
    )


SUPPLIER_PERFORMANCE_ORACLE = f"""
WITH master AS (
    SELECT s.s_suppkey, s.s_name, l.l_orderkey, l.l_quantity, l.l_partkey,
           {_REV} AS rev
    FROM supplier s
    LEFT JOIN lineitem l ON s.s_suppkey = l.l_suppkey AND l.l_returnflag <> 'R'
), agg AS (
    SELECT s_suppkey,
           CAST(ROUND(COALESCE(SUM(rev), 0), 2) AS DOUBLE) AS total_revenue,
           COUNT(l_orderkey) AS total_products_sold,
           CAST(COALESCE(SUM(l_quantity), 0) AS DOUBLE) AS total_stock_sold
    FROM master GROUP BY s_suppkey
), prod_rev AS (
    SELECT m.s_suppkey, p.p_name,
           CAST(ROUND(SUM(m.rev), 2) AS DOUBLE) AS product_revenue
    FROM master m JOIN part p ON m.l_partkey = p.p_partkey
    GROUP BY m.s_suppkey, p.p_name
), top AS (
    SELECT s_suppkey, p_name AS top_product FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY s_suppkey ORDER BY product_revenue DESC, p_name ASC
        ) AS rnk FROM prod_rev
    ) WHERE rnk = 1
)
SELECT a.s_suppkey AS supplier_id, s.s_name AS supplier_name,
       a.total_revenue, a.total_products_sold, a.total_stock_sold,
       t.top_product
FROM agg a
LEFT JOIN supplier s ON a.s_suppkey = s.s_suppkey
LEFT JOIN top t ON a.s_suppkey = t.s_suppkey
"""

register("q_supplier_performance", SUPPLIER_PERFORMANCE_ORACLE)(supplier_performance)


# Synthesized inventory attributes for part (the testdata has no
# stock/reorder columns — FIXTURES.md §2 maps them to deterministic
# functions of the part key, keeping the reference's value domains:
# stock 6,000–12,000, reorder-level-as-percent 10–50, cost 45–80% of
# selling price, Rest-API/main.py:130-137).
_STOCK = "(6000 + (p_partkey % 61) * 100)"
_REORDER = "(10 + (p_partkey % 41))"
_COST = "cast(round(cast(p_retailprice as decimal(18,2)) * 0.6, 2) as decimal(18,2))"


def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors m_product_performance_task.py:61-167.

    part ⟕ lineitem (theta in ON), multi-key groupBy over product
    attributes (A8), ratio-of-sums average sale price guarded by
    sum(qty)>0 (A6), derived stock-level status via when/otherwise, and
    profit = sales − qty·cost (decimal-exact).
    """
    part = read_parquet_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.col("p_type").alias("category"),
        F.expr(_STOCK).alias("stock_quantity"),
        F.expr(_REORDER).alias("reorder_level"),
        F.expr(_COST).alias("cost_price"),
    )
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")

    # Same agg-below-outer-join rewrite as supplier_performance: filter
    # the fact by the theta predicate, partially aggregate per part key
    # (map-side combine), then broadcast the small aggregate onto the
    # dimension — the multi-key groupBy over product attributes (A8)
    # becomes a post-join projection because the extra keys are
    # functionally dependent on p_partkey.
    qualified = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag").filter(
        F.col("l_returnflag") != "R"
    ).withColumn("rev", F.expr(_REV))
    per_part = qualified.groupBy("l_partkey").agg(
        F.sum("rev").alias("sum_rev"),
        F.sum("l_quantity").alias("sum_qty"),
    )
    agg = (
        part.join(broadcast_dim(per_part), F.col("p_partkey") == F.col("l_partkey"), "left")
        .withColumn("total_sales_amount", money_round(F.coalesce(F.col("sum_rev"), F.lit(0))))
        .withColumn(
            "avg_sale_price",
            F.when(
                F.col("sum_qty") > 0,
                F.round(F.coalesce(F.col("sum_rev").cast("double") / F.col("sum_qty"), F.lit(0.0)), 2),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("total_quantity_sold", F.coalesce(F.col("sum_qty"), F.lit(0)).cast("double"))
    )

    return (
        agg.withColumn("total_stocks_left", F.col("stock_quantity") - F.col("total_quantity_sold"))
        .withColumn("reordered_quantity", F.col("reorder_level") * F.col("stock_quantity") / 100)
        .withColumn(
            "stock_level_status",
            F.when(F.col("total_stocks_left") < F.col("reordered_quantity"), "Below Reorder Level").otherwise(
                "Sufficient Stock"
            ),
        )
        .withColumn(
            "profit",
            money_round(dec("total_sales_amount") - dec(F.col("total_quantity_sold")) * F.col("cost_price")),
        )
        .select(
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("product_name"),
            "total_sales_amount",
            "total_quantity_sold",
            "stock_quantity",
            "avg_sale_price",
            "reorder_level",
            "stock_level_status",
            "profit",
            F.col("cost_price").cast("double").alias("cost_price"),
            "category",
        )
    )


PRODUCT_PERFORMANCE_ORACLE = f"""
WITH part_inv AS (
    SELECT p_partkey, p_name, p_type AS category,
           {_STOCK} AS stock_quantity,
           {_REORDER} AS reorder_level,
           {_COST} AS cost_price
    FROM part
), master AS (
    SELECT p.*, l.l_quantity, {_REV} AS rev
    FROM part_inv p
    LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey AND l.l_returnflag <> 'R'
), agg AS (
    SELECT p_partkey, p_name, category, stock_quantity, reorder_level, cost_price,
           CAST(ROUND(COALESCE(SUM(rev), 0), 2) AS DOUBLE) AS total_sales_amount,
           CASE WHEN SUM(l_quantity) > 0
                THEN ROUND(COALESCE(CAST(SUM(rev) AS DOUBLE) / SUM(l_quantity), 0.0), 2)
                ELSE 0.0 END AS avg_sale_price,
           CAST(COALESCE(SUM(l_quantity), 0) AS DOUBLE) AS total_quantity_sold
    FROM master
    GROUP BY p_partkey, p_name, category, stock_quantity, reorder_level, cost_price
)
SELECT p_partkey AS product_id, p_name AS product_name,
       total_sales_amount, total_quantity_sold, stock_quantity,
       avg_sale_price, reorder_level,
       CASE WHEN (stock_quantity - total_quantity_sold) < (reorder_level * stock_quantity / 100)
            THEN 'Below Reorder Level' ELSE 'Sufficient Stock' END AS stock_level_status,
       CAST(ROUND(CAST(total_sales_amount AS DECIMAL(18,2))
                  - CAST(total_quantity_sold AS DECIMAL(18,2)) * cost_price, 2) AS DOUBLE) AS profit,
       CAST(cost_price AS DOUBLE) AS cost_price,
       category
FROM agg
"""

register("q_product_performance", PRODUCT_PERFORMANCE_ORACLE)(product_performance)


def customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors m_customer_metrics_task.py:77-261.

    customer ⟕ orders ⟕ lineitem (J1 + J5 multi-way), conditional counts
    (A4), min/max purchase dates (A3), NULL-safe money sums (A5), derived
    average-order-value (A7), active-customer flag vs the pinned AS_OF,
    and the most-used-payment-mode via row_number with the reference's
    exact tie-break: desc(count), asc(payment_mode) with NULLS FIRST —
    Spark's asc() default, which a saleless customer's NULL group wins
    (m_customer_metrics_task.py:176-195; preserved deliberately).
    """
    customer = read_parquet_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"
    )
    lineitem = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"
    )

    # Scale plan: the fact is reduced in two stages BEFORE the customer
    # dimension appears — lineitem pre-aggregates per order (map-side
    # combine, one shuffle on orderkey), the order-grain result
    # aggregates per customer (shuffle of pre-combined partials on
    # custkey), and only then joins the dimension.  Joining customers
    # into the raw fact first (as the reference does,
    # m_customer_metrics_task.py:77-98) would drag name/city/email
    # payloads through the widest shuffle.  Line-grain count semantics
    # are preserved by weighting order-level flags with the line count
    # (an order with no lines still contributed ONE null-extended row in
    # the reference's line-grain aggregate → greatest(n_lines, 1)).
    line_per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.sum(dec("l_extendedprice")).alias("sum_price"),
        F.sum(dec("l_extendedprice") * dec("l_tax")).alias("sum_ship_cost"),
        F.sum(dec("l_extendedprice") * dec("l_discount")).alias("sum_savings"),
    )
    ord_full = orders.join(line_per_order, F.col("o_orderkey") == F.col("l_orderkey"), "left")
    line_weight = F.greatest(F.col("n_lines"), F.lit(1))

    per_cust = ord_full.groupBy("o_custkey").agg(
        F.sum("sum_qty").alias("sum_qty"),
        F.max("max_ship").alias("max_ship"),
        F.min("min_ship").alias("min_ship"),
        F.sum("sum_ship_cost").alias("sum_ship_cost"),
        F.sum("sum_price").alias("sum_price"),
        F.sum("sum_savings").alias("sum_savings"),
        F.sum(F.when(F.col("o_orderstatus") == "F", line_weight).otherwise(0)).alias("delivered"),
        F.sum(F.when(F.col("o_orderstatus") == "P", line_weight).otherwise(0)).alias("cancelled"),
    )

    agg = (
        customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("sum_qty"), F.lit(0)).cast("double").alias("total_orders"),
            F.col("max_ship").alias("last_purchase_date"),
            F.col("min_ship").alias("first_purchase_date"),
            money_round(F.coalesce(F.col("sum_ship_cost"), F.lit(0))).alias("total_shipping_cost"),
            money_round(F.coalesce(F.col("sum_price"), F.lit(0))).alias("expenditure"),
            money_round(F.coalesce(F.col("sum_savings"), F.lit(0))).alias("total_amount_savings"),
            F.coalesce(F.col("delivered"), F.lit(0)).alias("delivered_orders_count"),
            F.coalesce(F.col("cancelled"), F.lit(0)).alias("cancelled_orders_count"),
        )
        .withColumn(
            "average_order_value",
            F.round(
                F.coalesce(
                    F.when(F.col("total_orders") != 0, F.col("expenditure") / F.col("total_orders")),
                    F.lit(0),
                ),
                2,
            ),
        )
        .withColumn(
            "active_customer_flag",
            F.when(
                F.col("last_purchase_date") >= F.date_sub(F.to_date(F.lit(AS_OF)), ACTIVE_WINDOW_DAYS),
                F.lit("TRUE"),
            ).otherwise(F.lit("FALSE")),
        )
    )

    # Payment-mode rank at order grain, weighted back to line grain
    # (count(*) over line rows == sum of per-order line weights).
    w = Window.partitionBy("o_custkey").orderBy(F.desc("pm_cnt"), F.asc("o_orderpriority"))
    pay_rank = (
        ord_full.groupBy("o_custkey", "o_orderpriority")
        .agg(F.sum(line_weight).alias("pm_cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("most_used_payment_mode"))
    )

    return agg.join(pay_rank, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        "total_orders",
        "total_amount_savings",
        "total_shipping_cost",
        "expenditure",
        "average_order_value",
        # timestamps, not dates: DATE round-trips as python objects on the
        # Spark side but datetime64 from DuckDB — value-hash comparison is
        # only stable when both engines emit TIMESTAMP.
        F.col("first_purchase_date").cast("date").cast("timestamp").alias("first_purchase_date"),
        F.col("last_purchase_date").cast("date").cast("timestamp").alias("last_purchase_date"),
        "most_used_payment_mode",
        "delivered_orders_count",
        "cancelled_orders_count",
        "active_customer_flag",
    )


CUSTOMER_METRICS_ORACLE = f"""
WITH full_rows AS (
    SELECT c.c_custkey, c.c_name, ol.o_orderstatus, ol.o_orderpriority,
           ol.l_quantity, ol.l_shipdate,
           CAST(ol.l_extendedprice AS DECIMAL(18,2)) AS price,
           CAST(ol.l_discount AS DECIMAL(18,2)) AS disc,
           CAST(ol.l_tax AS DECIMAL(18,2)) AS tax
    FROM customer c
    LEFT JOIN (
        SELECT o.o_custkey, o.o_orderstatus, o.o_orderpriority,
               l.l_quantity, l.l_shipdate, l.l_extendedprice,
               l.l_discount, l.l_tax
        FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ) ol ON c.c_custkey = ol.o_custkey
), agg AS (
    SELECT c_custkey, c_name,
           CAST(COALESCE(SUM(l_quantity), 0) AS DOUBLE) AS total_orders,
           CAST(CAST(MAX(l_shipdate) AS DATE) AS TIMESTAMP) AS last_purchase_date,
           CAST(CAST(MIN(l_shipdate) AS DATE) AS TIMESTAMP) AS first_purchase_date,
           CAST(ROUND(COALESCE(SUM(price * tax), 0), 2) AS DOUBLE) AS total_shipping_cost,
           CAST(ROUND(COALESCE(SUM(price), 0), 2) AS DOUBLE) AS expenditure,
           CAST(ROUND(COALESCE(SUM(price * disc), 0), 2) AS DOUBLE) AS total_amount_savings,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS delivered_orders_count,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cancelled_orders_count
    FROM full_rows GROUP BY c_custkey, c_name
), pay AS (
    SELECT c_custkey, o_orderpriority AS most_used_payment_mode FROM (
        SELECT c_custkey, o_orderpriority, COUNT(*) AS pm_cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY COUNT(*) DESC, o_orderpriority ASC NULLS FIRST
               ) AS rnk
        FROM full_rows GROUP BY c_custkey, o_orderpriority
    ) WHERE rnk = 1
)
SELECT a.c_custkey AS customer_id, a.c_name AS customer_name,
       a.total_orders, a.total_amount_savings, a.total_shipping_cost,
       a.expenditure,
       ROUND(COALESCE(CASE WHEN a.total_orders <> 0
                           THEN a.expenditure / a.total_orders END, 0), 2)
           AS average_order_value,
       a.first_purchase_date, a.last_purchase_date,
       p.most_used_payment_mode,
       a.delivered_orders_count, a.cancelled_orders_count,
       CASE WHEN a.last_purchase_date >= DATE '{AS_OF}' - INTERVAL {ACTIVE_WINDOW_DAYS} DAY
            THEN 'TRUE' ELSE 'FALSE' END AS active_customer_flag
FROM agg a LEFT JOIN pay p ON a.c_custkey = p.c_custkey
"""

register("q_customer_metrics", CUSTOMER_METRICS_ORACLE)(customer_metrics)


def customer_sales_report(
    spark: SparkSession, sf_dir: str, exact_quantiles: bool = True
) -> DataFrame:
    """Mirrors m_customer_sales_report_task.py:60-253.

    customer ⟕ sales with the theta in the ON clause (J2, order grain:
    o_orderstatus != 'P'), inner product join (J3), computed price /
    sale_amount columns (P4), loyalty tiers via quantile bucketing (C2),
    and the cross-pipeline top-performer flag sourced from
    supplier_performance's top products (F4 → broadcast join, not the
    reference's driver-side isin list).

    ``exact_quantiles`` picks the tier-cut estimator: True (default, the
    oracle-pinned path) runs exact ``percentile_cont`` — a global sort of
    the per-customer aggregate — as a 1-row aggregate broadcast back
    onto the tiers (r14: fully lazy, no driver collect, no eager build
    job); False is the SCALE path, Spark's ``approxQuantile`` with
    relativeError 0.01 (the reference's own budget,
    m_customer_sales_report_task.py:183-186) — a mergeable
    Greenwald-Khanna sketch, no global sort, two scalars collected.
    The barrier between the per-customer aggregate and the tier
    projection is inherent to the reference's C2 semantics (cuts are
    data-dependent constants).
    """
    customer = read_parquet_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    orders = read_parquet_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    lineitem = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_discount", "l_shipdate"
    )
    part = read_parquet_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", F.col("p_type").alias("category"), "p_retailprice"
    )

    sales = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey")).withColumn(
        "sale_id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    # The reference writes this as a theta LEFT join (J2) followed by an
    # INNER product join (m_customer_sales_report_task.py:88-121) — the
    # inner join drops every NULL-extended row again, so the composition
    # is exactly a theta INNER join.  Planning it as inner from the start
    # removes the preserved-side constraint, letting AQE pick sides
    # freely for the big shuffle.
    jnr = customer.join(
        sales,
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") != "P"),
        "inner",
    )
    master = jnr.join(broadcast_dim(part), F.col("l_partkey") == F.col("p_partkey"), "inner")

    enriched = (
        master.withColumn("price", money_round(dec("p_retailprice") * (F.lit(1).cast(MONEY) - dec("l_discount"))))
        .withColumn(
            "sale_amount",
            money_round(dec(F.col("l_quantity")) * dec("p_retailprice") * (F.lit(1).cast(MONEY) - dec("l_discount"))),
        )
        .withColumn("sale_date", F.coalesce(F.col("l_shipdate").cast("date"), F.date_sub(F.to_date(F.lit(AS_OF)), 1)))
        .withColumn("sale_year", F.year("sale_date").cast("bigint"))
        .withColumn("sale_month", F.date_format("sale_date", "MMMM"))
    )

    per_customer = enriched.groupBy("c_custkey").agg(F.sum(dec("sale_amount")).cast("double").alias("agg_sales_amount"))
    if exact_quantiles:
        # r14 (guide §5 — the driver should do almost no data work): the
        # cuts used to be .first()-collected at BUILD time, which made
        # every construction of this query pay an eager full
        # join+aggregate+sort job before the real plan even ran, and
        # (being driver constants) re-pay it per invocation.  A 1-row
        # cuts aggregate broadcast-joined back keeps everything in ONE
        # lazy plan — same percentile values, same tier comparisons
        # (row-identical at sf0.001/sf0.01, oracle-hash green), zero
        # driver barrier; measured build 2.11 s → 0.78 s at sf0.1.  The
        # NULL-cuts edge (empty per_customer) behaves identically: the
        # cross join is then empty, matching the old all-BRONZE-of-zero-
        # rows outcome.
        cuts = per_customer.agg(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY agg_sales_amount)").alias("_silver"),
            F.expr("percentile_cont(0.8) WITHIN GROUP (ORDER BY agg_sales_amount)").alias("_gold"),
        )
        tiers = per_customer.join(F.broadcast(cuts)).withColumn(
            "loyalty_tier",
            F.when(F.col("agg_sales_amount") > F.col("_gold"), "GOLD")
            .when(F.col("agg_sales_amount").between(F.col("_silver"), F.col("_gold")), "SILVER")
            .otherwise("BRONZE"),
        ).select("c_custkey", "loyalty_tier")
    else:
        # approxQuantile returns [] on empty/all-null input; degrade to
        # (None, None) like the exact path's .first() did
        aq = per_customer.approxQuantile("agg_sales_amount", [0.5, 0.8], 0.01)
        silver, gold = (aq[0], aq[1]) if len(aq) == 2 else (None, None)
        tiers = per_customer.withColumn(
            "loyalty_tier",
            F.when(F.col("agg_sales_amount") > gold, "GOLD")
            .when(F.col("agg_sales_amount").between(silver, gold), "SILVER")
            .otherwise("BRONZE"),
        ).select("c_custkey", "loyalty_tier")

    top_products = (
        supplier_performance(spark, sf_dir)
        .select(F.col("top_product"))
        .filter(F.col("top_product").isNotNull())
        .distinct()
        .withColumn("is_top", F.lit(True))
    )

    return (
        enriched.join(broadcast_dim(tiers), "c_custkey", "inner")
        .join(broadcast_dim(top_products), enriched["p_name"] == top_products["top_product"], "left")
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            "sale_id",
            F.col("c_mktsegment").alias("city"),
            F.col("p_name").alias("product_name"),
            "category",
            F.col("sale_date").cast("timestamp").alias("sale_date"),
            "sale_month",
            "sale_year",
            F.col("l_quantity").alias("quantity"),
            "price",
            "sale_amount",
            "loyalty_tier",
            F.coalesce(F.col("is_top"), F.lit(False)).alias("top_performer"),
        )
    )


CUSTOMER_SALES_REPORT_ORACLE = f"""
WITH sales AS (
    SELECT o.o_custkey, o.o_orderstatus, l.l_orderkey * 10 + l.l_linenumber AS sale_id,
           l.l_partkey, l.l_quantity, l.l_discount, l.l_shipdate
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), enriched AS (
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, s.sale_id, s.l_quantity,
           p.p_name, p.p_type AS category,
           CAST(ROUND(CAST(p.p_retailprice AS DECIMAL(18,2))
                      * (1 - CAST(s.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS price,
           CAST(ROUND(CAST(s.l_quantity AS DECIMAL(18,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * (1 - CAST(s.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS sale_amount,
           CAST(ROUND(CAST(s.l_quantity AS DECIMAL(18,2))
                      * CAST(p.p_retailprice AS DECIMAL(18,2))
                      * (1 - CAST(s.l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(38,6)) AS sale_amount_dec,
           COALESCE(CAST(s.l_shipdate AS DATE), DATE '{AS_OF}' - 1) AS sale_date
    FROM customer c
    LEFT JOIN sales s ON c.c_custkey = s.o_custkey AND s.o_orderstatus <> 'P'
    JOIN part p ON s.l_partkey = p.p_partkey
), per_customer AS (
    SELECT c_custkey, CAST(SUM(sale_amount_dec) AS DOUBLE) AS agg_sales_amount
    FROM enriched GROUP BY c_custkey
), cuts AS (
    SELECT quantile_cont(agg_sales_amount, 0.5) AS silver,
           quantile_cont(agg_sales_amount, 0.8) AS gold
    FROM per_customer
), tiers AS (
    SELECT pc.c_custkey,
           CASE WHEN pc.agg_sales_amount > c.gold THEN 'GOLD'
                WHEN pc.agg_sales_amount BETWEEN c.silver AND c.gold THEN 'SILVER'
                ELSE 'BRONZE' END AS loyalty_tier
    FROM per_customer pc CROSS JOIN cuts c
), top_products AS (
    SELECT DISTINCT top_product FROM ({SUPPLIER_PERFORMANCE_ORACLE})
    WHERE top_product IS NOT NULL
)
SELECT e.c_custkey AS customer_id, e.c_name AS customer_name, e.sale_id,
       e.c_mktsegment AS city, e.p_name AS product_name, e.category,
       CAST(e.sale_date AS TIMESTAMP) AS sale_date, monthname(e.sale_date) AS sale_month,
       CAST(year(e.sale_date) AS BIGINT) AS sale_year,
       e.l_quantity AS quantity, e.price, e.sale_amount, t.loyalty_tier,
       (e.p_name IN (SELECT top_product FROM top_products)) AS top_performer
FROM enriched e JOIN tiers t ON e.c_custkey = t.c_custkey
"""

register("q_customer_sales_report", CUSTOMER_SALES_REPORT_ORACLE)(customer_sales_report)
