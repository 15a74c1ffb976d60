"""Execution coverage for the JDBC source/sink wrappers (S1/S2/K1)
against embedded Apache Derby — the one JDBC engine guaranteed on
Spark's classpath (it ships in Spark's jars/ for the Hive metastore).

This is the round-trip the reference runs against Postgres
(ETL-Airflow/dags/tasks/utils.py:181-246): write append/overwrite, full
table scan, bounded partitioned scan, and DB-side pushdown query.
Embedded Derby runs inside the driver JVM, which local-mode executors
share, so the same code path Spark uses for Postgres/MySQL exercises
end-to-end without a server.
"""

from __future__ import annotations

import pytest

from meta_morph_etl_databricks_spark.sources.scans import read_jdbc_query, read_jdbc_table
from meta_morph_etl_databricks_spark.sources.sinks import write_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def _people(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(1, 11)],
        "id int, name string, score double",
    )


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = _people(spark)
    # append onto a fresh table creates it (reference mode, utils.py:230-238)
    write_jdbc(
        df,
        derby_url,
        "people",
        mode="append",
        properties={**DRIVER, "createTableColumnTypes": "name VARCHAR(64)"},
    )
    back = read_jdbc_table(spark, derby_url, "people", properties=DRIVER)
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == sorted(
        (r.id, r.name, r.score) for r in df.collect()
    )
    # second append duplicates; overwrite replaces
    write_jdbc(df, derby_url, "people", mode="append", properties=DRIVER)
    assert read_jdbc_table(spark, derby_url, "people", properties=DRIVER).count() == 20
    write_jdbc(
        df.filter("id <= 3"),
        derby_url,
        "people",
        mode="overwrite",
        properties={**DRIVER, "createTableColumnTypes": "name VARCHAR(64)"},
    )
    assert read_jdbc_table(spark, derby_url, "people", properties=DRIVER).count() == 3


def test_jdbc_partitioned_scan(spark, derby_url):
    write_jdbc(
        _people(spark),
        derby_url,
        "people_part",
        mode="overwrite",
        properties={**DRIVER, "createTableColumnTypes": "name VARCHAR(64)"},
    )
    got = read_jdbc_table(
        spark,
        derby_url,
        "people_part",
        properties=DRIVER,
        num_partitions=4,
        partition_column="id",
        lower_bound=1,
        upper_bound=11,
    )
    # bounds split the scan into real parallel partitions without
    # changing the result set (reference forwards numPartitions=4,
    # utils.py:197-205)
    assert got.rdd.getNumPartitions() == 4
    # the split is real: rows actually land in more than one partition
    # (each partition issues its own bounded WHERE to Derby), and the
    # partitioned result is row-identical to the single-stream read
    sizes = got.rdd.glom().map(len).collect()
    assert sum(1 for s in sizes if s > 0) > 1, sizes
    assert sum(sizes) == 10
    single = read_jdbc_table(spark, derby_url, "people_part", properties=DRIVER)
    key = lambda r: (r.id, r.name, r.score)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, single.collect()))


def test_jdbc_tuning_options_forwarded(spark, derby_url):
    """The reference's Postgres tuning options (fetchsize, isolation —
    utils.py:197-205) ride through the properties dict to the JDBC
    reader/writer; exercised with values Derby honors."""
    write_jdbc(
        _people(spark),
        derby_url,
        "people_opts",
        mode="overwrite",
        properties={**DRIVER, "createTableColumnTypes": "name VARCHAR(64)", "batchsize": "3"},
    )
    got = read_jdbc_table(
        spark,
        derby_url,
        "people_opts",
        properties={**DRIVER, "fetchsize": "2", "isolationLevel": "READ_COMMITTED"},
    )
    assert got.count() == 10


def test_jdbc_pushdown_query(spark, derby_url):
    write_jdbc(
        _people(spark),
        derby_url,
        "people_q",
        mode="overwrite",
        properties={**DRIVER, "createTableColumnTypes": "name VARCHAR(64)"},
    )
    got = read_jdbc_query(
        spark,
        derby_url,
        # aggregate runs INSIDE Derby — only 1 row crosses the wire.
        # Spark's JDBC writer quotes column identifiers on CREATE, so the
        # pushdown SQL must quote them too (Derby uppercases bare names).
        'SELECT COUNT(*) AS "n", SUM("score") AS "total" FROM people_q WHERE "id" > 5',
        properties=DRIVER,
    )
    row = got.collect()[0]
    assert row.n == 5 and row.total == pytest.approx(sum(i * 1.5 for i in range(6, 11)))
