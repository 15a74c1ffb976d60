from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.quality import DuplicateException, assert_unique, reconcile


def test_assert_unique_passes(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert assert_unique(orders, ["o_orderkey"]) is orders


def test_assert_unique_raises(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(DuplicateException) as ei:
        assert_unique(li, ["l_orderkey", "l_linenumber"])
    assert "l_orderkey" in str(ei.value)


def test_reconcile_identical(spark):
    df = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ["id", "name", "val"])
    r = reconcile(df, df, ["id"])
    assert r.cells.isEmpty() and r.extra_source.isEmpty() and r.extra_target.isEmpty()
    assert r.summary.isEmpty()


def test_reconcile_mismatch_and_extras(spark):
    src = spark.createDataFrame([(1, "a", "10"), (2, "b", "20"), (3, "c", "30")], ["id", "name", "val"])
    tgt = spark.createDataFrame([(1, "a", "10"), (2, "B", "20"), (4, "d", "40")], ["id", "name", "val"])
    r = reconcile(src, tgt, ["id"])
    cells = {(c.id, c.column_name): (c.source_value, c.target_value) for c in r.cells.collect()}
    assert cells == {(2, "name"): ("b", "B")}
    assert [e.id for e in r.extra_source.collect()] == [3]
    assert [e.id for e in r.extra_target.collect()] == [4]
    s = r.summary.collect()[0]
    assert s.column_name == "name" and s.mismatch_count == 1
    # 1 of 3 source rows → 33.33% (truncated basis points)
    assert s.mismatch_pct == 33.33


def test_reconcile_null_equals_empty(spark):
    # reference semantics: na.fill('') makes NULL == '' (Raptor.py:553)
    src = spark.createDataFrame([(1, None)], "id int, v string")
    tgt = spark.createDataFrame([(1, "")], "id int, v string")
    assert reconcile(src, tgt, ["id"]).cells.isEmpty()


def test_sql_route_rewrites_qualified_names(spark, tmp_path):
    """A warehouse-style query with schema-qualified names must run
    against the registered bare views (reference Raptor.py:445-453)."""
    from meta_morph_etl_databricks_spark.quality.raptor_api import submit_reconcile_request

    df = spark.createDataFrame([(1, "a"), (2, "b")], "pk int, name string")
    df.createOrReplaceTempView("cust_mart")
    rep = submit_reconcile_request(
        spark,
        ("sql", "SELECT m.pk, m.name FROM reporting.cust_mart AS m WHERE m.pk > 0"),
        ("sql", "SELECT pk, name FROM dev.cust_mart"),
        primary_key="pk",
    )
    row = rep.overview.collect()[0]
    assert (row.source_rows, row.matched_rows, row.match_pct) == (2, 2, 100.0)


def test_rewrite_skips_literals_aliases_and_comments(spark):
    """The schema-prefix rewrite must only touch TABLE-position refs:
    string literals containing `schema.name`, alias-qualified column
    refs whose column name collides with a registered view, and comments
    all pass through verbatim."""
    from meta_morph_etl_databricks_spark.quality.raptor_api import _rewrite_qualified_names

    spark.createDataFrame([(1,)], "pk int").createOrReplaceTempView("orders_v")
    spark.createDataFrame([(1, "x")], "pk int, status string").createOrReplaceTempView("status")

    # literal untouched, FROM-position ref rewritten
    sql = "SELECT * FROM reporting.orders_v WHERE src = 'reporting.orders_v'"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT * FROM orders_v WHERE src = 'reporting.orders_v'"
    )
    # alias.col whose col name IS a registered view: untouched (not table position)
    sql = "SELECT o.status FROM reporting.status AS o WHERE o.status = 'OPEN'"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT o.status FROM status AS o WHERE o.status = 'OPEN'"
    )
    # comma-separated FROM list rewrites both; SELECT-list refs untouched
    sql = "SELECT a.pk, b.pk FROM reporting.orders_v a, reporting.status b"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT a.pk, b.pk FROM orders_v a, status b"
    )
    # JOIN position rewritten; ON-clause refs untouched
    sql = "SELECT 1 FROM reporting.orders_v o JOIN dev.status s ON o.pk = s.pk"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT 1 FROM orders_v o JOIN status s ON o.pk = s.pk"
    )
    # comments opaque
    sql = "SELECT 1 FROM reporting.orders_v -- reads reporting.orders_v\n"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT 1 FROM orders_v -- reads reporting.orders_v\n"
    )
    # AS-aliased tables keep the FROM list armed for later commas
    sql = "SELECT 1 FROM reporting.orders_v AS o, reporting.status AS s"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT 1 FROM orders_v AS o, status AS s"
    )
    # 3-part schema.table.col refs are stripped anywhere (ON clause here)
    sql = (
        "SELECT 1 FROM reporting.orders_v JOIN reporting.status "
        "ON reporting.orders_v.pk = reporting.status.pk"
    )
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT 1 FROM orders_v JOIN status ON orders_v.pk = status.pk"
    )
    # a FROM inside a function call dies with its paren: the SELECT-list
    # comma after it must NOT re-arm table position for alias.col
    sql = "SELECT extract(day FROM ts), o.status FROM reporting.status AS o"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT extract(day FROM ts), o.status FROM status AS o"
    )
    # a subquery's SELECT cannot disarm the OUTER from-list
    sql = "SELECT 1 FROM (SELECT pk FROM reporting.orders_v) t, reporting.status"
    assert _rewrite_qualified_names(spark, sql) == (
        "SELECT 1 FROM (SELECT pk FROM orders_v) t, status"
    )


def test_reconcile_lazy_build_and_single_action_overview(spark):
    """Building a ReconcileResult must trigger NO Spark job (the old code
    ran an eager source.count() at plan-build time), and the overview must
    be one action over the shared full-outer join, not ~6 separate counts."""
    src = spark.createDataFrame([(i, f"n{i}") for i in range(100)], "pk int, name string")
    tgt = spark.createDataFrame([(i, f"n{i + (i % 7 == 0)}") for i in range(2, 102)], "pk int, name string")

    spark.sparkContext.setJobGroup("recon_build", "build")
    r = reconcile(src, tgt, ["pk"])
    assert list(spark.sparkContext.statusTracker().getJobIdsForGroup("recon_build")) == []

    spark.sparkContext.setJobGroup("recon_overview", "overview")
    row = r.overview.collect()[0]
    n_jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup("recon_overview"))
    spark.sparkContext.setJobGroup(None, None)
    # one action; AQE may split it into a few query-stage jobs, but far
    # fewer than the ~6 independent count actions this replaced
    assert 1 <= n_jobs <= 4
    assert (row.source_rows, row.target_rows) == (100, 100)
    assert (row.extra_source, row.extra_target) == (2, 2)
    assert row.matched_rows + row.mismatched_rows == 98


def test_submit_reconcile_request_routing_and_report(spark, tmp_path):
    from meta_morph_etl_databricks_spark.quality.raptor_api import submit_reconcile_request

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "pk int, name string, amt double"
    )
    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], "pk int, name string, amt double"
    )
    src.write.parquet(str(tmp_path / "src"))
    tgt.createOrReplaceTempView("raptor_tgt")

    out = str(tmp_path / "report")
    rep = submit_reconcile_request(
        spark,
        ("parquet", str(tmp_path / "src")),
        ("sql", "SELECT * FROM raptor_tgt"),
        primary_key="pk",
        output_path=out,
    )
    row = rep.overview.collect()[0]
    assert (row.source_rows, row.target_rows) == (3, 3)
    assert row.mismatched_rows == 1        # pk=2 name differs
    assert (row.extra_source, row.extra_target) == (1, 1)  # pk=3 / pk=4
    assert row.matched_rows == 1 and row.match_pct == 33.33
    cells = spark.read.parquet(f"{out}/cells").collect()
    assert len(cells) == 1 and cells[0].column_name == "name"
    assert spark.read.parquet(f"{out}/overview").count() == 1


def test_render_report_html_sections_bounded(spark):
    from meta_morph_etl_databricks_spark.quality.raptor_api import submit_reconcile_request
    from meta_morph_etl_databricks_spark.quality.report import render_report_html

    src = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(1, 41)], "pk int, name string, amt double"
    )
    tgt = spark.createDataFrame(
        [(i, f"n{i}" if i % 2 else "X", float(i)) for i in range(3, 43)],
        "pk int, name string, amt double",
    )
    rep = submit_reconcile_request(spark, src, tgt, primary_key="pk")
    html = render_report_html(rep, limit=5, title="orders")
    for section in (
        "Overall Summary", "Column Level Mismatch Summary",
        "Column Level Mismatch Percentage", "Source Extra Records Sample",
        "Target Extra Records Sample",
    ):
        assert section in html
    assert "orders" in html and "<table" in html
    # exemplar section carries the mismatching column, bounded to one row per column
    assert html.count(">name<") >= 1
    # bounded collect: at most `limit` data rows per section table
    assert html.count("<tr>") <= 5 * (5 + 2)
