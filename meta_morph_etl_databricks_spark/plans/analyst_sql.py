"""The 8 Superset Query-Lab analyst queries (SURVEY.md §3.3, A12, O1–O3),
ported to ``spark.sql`` over registered views (S6) and mapped onto the
testdata star schema:

    legacy.sales → orders (payment_mode → o_orderpriority)
    legacy.customer_sales_report → the customer_sales_report mart
    legacy.supplier_performance → the supplier_performance mart
    legacy.suppliers.REGION → supplier→nation→region.r_name
    legacy.products → part (supplier link via distinct lineitem pairs)

Each query is ONE portable SQL string executed verbatim by both Spark
and the DuckDB oracle — dialect-specific functions (monthname,
date_format) are avoided in favor of portable CASE/EXTRACT forms, so the
oracle is the same text by construction.  Reference SQL cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.scans import load_tables
from .marts import AS_OF, CUSTOMER_SALES_REPORT_ORACLE, SUPPLIER_PERFORMANCE_ORACLE
from .registry import register

# Portable month-name expression (the reference uses date_format 'MMMM' /
# a 12-branch CASE — Monthly_Sales_Heatmap.sql:3-16; we reuse its CASE
# form since it is dialect-free).
_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]


def month_name_sql(expr: str) -> str:
    branches = " ".join(f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(_MONTHS))
    return f"CASE EXTRACT(MONTH FROM {expr}) {branches} END"


def month_number_sql(month_name_expr: str) -> str:
    branches = " ".join(f"WHEN '{m}' THEN '{i + 1:02d}'" for i, m in enumerate(_MONTHS))
    return f"CASE {month_name_expr} {branches} END"


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

# Mart-backed queries compose the mart as a CTE so the analyst SQL is
# self-contained for both engines (in the reference the mart is a
# materialized Postgres table; here the optimizer sees through the CTE).
_CSR = f"csr AS ({CUSTOMER_SALES_REPORT_ORACLE})"
_SUPPLIER_PERF = f"supplier_perf AS ({SUPPLIER_PERFORMANCE_ORACLE})"

ANALYST_SQL: dict[str, str] = {
    # Payment_Mode_Distribution.sql:1-8
    "q_sql_payment_mode_distribution": """
        SELECT o_orderpriority AS payment_mode, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority
    """,
    # Total_Order_Over_Time.sql:1-9 (SALE_DATE > current_date - 8 →
    # pinned AS_OF window; sale grain = lineitem)
    "q_sql_total_order_over_time": f"""
        SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS sale_date,
               CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS total_sale_amount
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) > DATE '{AS_OF}' - 8
        GROUP BY CAST(l_shipdate AS DATE)
    """,
    # Average_Order_Value.sql:1-14
    "q_sql_average_order_value": f"""
        SELECT {month_name_sql("CAST(l_shipdate AS DATE)")} || '-' ||
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS STRING) AS month_year,
               CAST(ROUND(CAST(SUM({_REV_SQL}) AS DOUBLE) / COUNT(l_orderkey), 2) AS DOUBLE)
                   AS avg_order_value
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) > DATE '{AS_OF}' - 150
        GROUP BY {month_name_sql("CAST(l_shipdate AS DATE)")},
                 EXTRACT(YEAR FROM l_shipdate),
                 EXTRACT(MONTH FROM l_shipdate)
    """,
    # Revenue_By_Region.sql:1-11 (REGION via supplier→nation→region)
    "q_sql_revenue_by_region": f"""
        WITH {_SUPPLIER_PERF}
        SELECT r.r_name AS region,
               CAST(ROUND(SUM(CAST(sp.total_revenue AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS regional_revenue
        FROM supplier_perf sp
        JOIN supplier s ON TRIM(CAST(s.s_suppkey AS STRING)) = TRIM(CAST(sp.supplier_id AS STRING))
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    # Monthly_Sales_Heatmap.sql:1-30 (CASE month ordering + LIMIT 100;
    # (month, year) groups are unique so the LIMIT is deterministic)
    "q_sql_monthly_sales_heatmap": f"""
        WITH monthly AS (
            SELECT {month_name_sql("CAST(l_shipdate AS DATE)")} AS sale_month,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS sale_year,
                   CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS sum_sale
            FROM lineitem
            GROUP BY 1, 2
        )
        SELECT {month_number_sql("sale_month")} || ' - ' || sale_month AS sale_month_ordered,
               sale_year, sum_sale
        FROM monthly
        ORDER BY sale_month_ordered ASC, sale_year DESC
        LIMIT 100
    """,
    # Product_Contribution_By_Region.sql:1-12 (part↔supplier pairs via
    # distinct lineitem references — F8 + J5 multiway)
    "q_sql_product_contribution_by_region": """
        SELECT r.r_name AS region, COUNT(*) AS product_count
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    # Supplier_Performance_By_Revenue.sql:1-8
    "q_sql_supplier_performance_by_revenue": f"""
        WITH {_SUPPLIER_PERF}
        SELECT supplier_id,
               CAST(SUM(total_products_sold) AS BIGINT) AS sum_products_sold,
               CAST(ROUND(SUM(CAST(total_revenue AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_revenue
        FROM supplier_perf
        GROUP BY supplier_id
    """,
    # Top_Selling_Supplier_Products.sql:1-30 (J11 two-key join incl.
    # name-key; deterministic tie-break added on product_id)
    "q_sql_top_selling_supplier_products": f"""
        WITH {_SUPPLIER_PERF}
        SELECT supplier_id, product_id, top_selling_product, category, total_revenue
        FROM (
            SELECT sp.supplier_id, p.p_partkey AS product_id,
                   sp.top_product AS top_selling_product,
                   p.p_type AS category, sp.total_revenue,
                   ROW_NUMBER() OVER (
                       PARTITION BY sp.supplier_id
                       ORDER BY sp.total_revenue DESC, p.p_partkey ASC
                   ) AS rnk
            FROM supplier_perf sp
            JOIN part p ON TRIM(p.p_name) = TRIM(sp.top_product)
        ) ranked
        WHERE rnk = 1
    """,
}


# Tables each query actually references (r14, guide §1.2 per-task
# work): registering the full 10-table star per build cost ~0.85 s of
# driver-side scan/view setup PER INVOCATION (10 parquet opens + view
# registrations; measured q_sql_payment_mode_distribution 1.07 s →
# 0.14 s with only its one table loaded).  The queries behave
# identically — views are lazy name→plan bindings, and every referenced
# table is still registered fresh from sf_dir on every call.
_TABLES_USED: dict[str, tuple[str, ...]] = {
    "q_sql_payment_mode_distribution": ("orders",),
    "q_sql_total_order_over_time": ("lineitem",),
    "q_sql_average_order_value": ("lineitem",),
    "q_sql_revenue_by_region": ("supplier", "lineitem", "part", "nation", "region"),
    "q_sql_monthly_sales_heatmap": ("lineitem",),
    "q_sql_product_contribution_by_region": ("lineitem", "supplier", "nation", "region"),
    "q_sql_supplier_performance_by_revenue": ("supplier", "lineitem", "part"),
    "q_sql_top_selling_supplier_products": ("supplier", "lineitem", "part"),
}


def _make_sql_query(name: str, sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir, _TABLES_USED[name])
        return spark.sql(sql)

    return fn


for _name, _sql in ANALYST_SQL.items():
    register(_name, _sql)(_make_sql_query(_name, _sql))
