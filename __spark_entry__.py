"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship supplier_performance mart at sf0.001;
``queries()`` exposes every declared operator query from SURVEY.md §2.13;
``oracle_sql()`` gives the DuckDB-equivalent SQL with identical column
aliases (the driver hash-compares values with columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from meta_morph_etl_databricks_spark.plans import oracle_map, query_fns


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from meta_morph_etl_databricks_spark.plans.marts import supplier_performance

    return supplier_performance(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_map()
