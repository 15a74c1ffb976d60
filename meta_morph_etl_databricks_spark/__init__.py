"""meta_morph_etl_databricks_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark rebuild of the query and data-processing
capabilities of the reference repo
``yateesh-chandra-duggirala/Meta-Morph-ETL-Databricks`` (surveyed in
SURVEY.md).  The reference is an Airflow+PySpark retail ETL platform; this
package re-expresses its operator inventory (SURVEY.md §2) as a composable
library of pure ``DataFrame -> DataFrame`` functions, designed for
multi-executor scale:

- declarative DataFrame/SQL plans so Catalyst handles pruning/pushdown,
- broadcast hints for small dimensions, AQE for skew/coalesce,
- decimal-exact money arithmetic (order-independent, oracle-comparable),
- zero row-at-a-time Python UDFs in relational paths; Arrow-batched
  pandas UDFs only for genuinely non-relational extensions.

Layout:
    sources/    scans + sinks (parquet/csv/json/rows/jdbc, merge upsert)
    functions/  scalar/column expression helpers (SURVEY.md §2.9)
    operators/  joins, aggregates, windows, bucketing, dedup, similarity,
                text analysis, multimodal plumbing (SURVEY.md §2.3–2.8, M6)
    quality/    dup gate + dataset reconciliation (SURVEY.md C3/C6)
    plans/      the four mart pipelines + analyst SQL (SURVEY.md §3)
    streaming/  Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
