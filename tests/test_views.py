"""View DDL battery mirroring mysql-test/suite/tianmu/t/create_view.test.

Covers: 1050 on duplicate CREATE (including over a base table), 1051 on
DROP TABLE of a view / DROP of a missing name, OR REPLACE definition
update, SELECT-through-view == inline subquery (DuckDB oracle), and
refresh_views dependency ordering after copy-on-write DML re-points a
base relation.
"""

from __future__ import annotations

import pytest

from stonedb_spark.queries import all_queries
from stonedb_spark.sources import (
    NotATableError,
    NotAViewError,
    ViewExistsError,
    create_view,
    drop_table_guard,
    drop_view,
    list_views,
    refresh_views,
    view_definition,
)
from stonedb_spark.testing import check_query


def test_view_over_tpch_matches_oracle(spark, oracle, sf_dir):
    q = all_queries()["view_over_tpch"]
    problems = check_query(spark, oracle, q, sf_dir)
    assert not problems, problems


def test_duplicate_create_raises_1050(spark):
    spark.range(3).createOrReplaceTempView("vt_dup_base")
    try:
        create_view(spark, "v_dup", "SELECT id FROM vt_dup_base")
        with pytest.raises(ViewExistsError) as ei:
            create_view(spark, "v_dup", "SELECT id + 1 AS id FROM vt_dup_base")
        assert ei.value.errno == 1050
        # create_view.test: CREATE OR REPLACE over a *view* is legal and
        # updates the stored definition
        create_view(spark, "v_dup", "SELECT id * 2 AS id FROM vt_dup_base", or_replace=True)
        assert "id * 2" in view_definition(spark, "v_dup")
        assert sorted(r["id"] for r in spark.table("v_dup").collect()) == [0, 2, 4]
    finally:
        drop_view(spark, "v_dup")
        spark.catalog.dropTempView("vt_dup_base")


def test_create_over_base_table_raises_1050(spark):
    """MySQL 1050 applies to ANY existing table name, not just views —
    and OR REPLACE may replace only a view, never hijack a base table."""
    spark.range(5).createOrReplaceTempView("vt_claimed")
    try:
        with pytest.raises(ViewExistsError):
            create_view(spark, "vt_claimed", "SELECT 1 AS one")
        with pytest.raises(ViewExistsError):
            create_view(spark, "vt_claimed", "SELECT 1 AS one", or_replace=True)
        # the base binding must be untouched
        assert spark.table("vt_claimed").count() == 5
        assert "vt_claimed" not in list_views(spark)
    finally:
        spark.catalog.dropTempView("vt_claimed")


def test_drop_errno_parity(spark):
    spark.range(2).createOrReplaceTempView("vt_plain")
    try:
        create_view(spark, "v_guard", "SELECT id FROM vt_plain")
        # DROP TABLE v_guard -> 1051 (it is a view; create_view.test:40)
        with pytest.raises(NotATableError) as ei:
            drop_table_guard(spark, "v_guard")
        assert ei.value.errno == 1051
        # DROP VIEW vt_plain -> 1051 (it is a table)
        with pytest.raises(NotAViewError):
            drop_view(spark, "vt_plain")
        # DROP TABLE on a missing name -> 1051
        with pytest.raises(NotATableError):
            drop_table_guard(spark, "vt_never_existed")
        # DROP VIEW on a missing name -> 1051
        with pytest.raises(NotAViewError):
            drop_view(spark, "v_never_existed")
        drop_view(spark, "v_guard")
        # after DROP VIEW the name is gone: SELECT raises Spark's own
        # TABLE_OR_VIEW_NOT_FOUND (MySQL 1146 analog)
        from pyspark.errors import AnalysisException

        with pytest.raises(AnalysisException):
            spark.table("v_guard").collect()
        # and drop_table_guard can now remove the plain temp view
        drop_table_guard(spark, "vt_plain")
    finally:
        spark.catalog.dropTempView("vt_plain")


def test_refresh_views_after_base_repoint(spark):
    """Copy-on-write DML re-points a base temp view; refresh_views
    restores MySQL's reference-time resolution for dependent views."""
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("vt_cow")
    try:
        create_view(spark, "v_cow", "SELECT SUM(x) AS s FROM vt_cow")
        assert spark.table("v_cow").collect()[0]["s"] == 1
        spark.createDataFrame([(10,), (20,)], "x int").createOrReplaceTempView("vt_cow")
        # the view captured the analyzed plan at creation: still stale
        assert spark.table("v_cow").collect()[0]["s"] == 1
        refresh_views(spark)
        assert spark.table("v_cow").collect()[0]["s"] == 30
    finally:
        drop_view(spark, "v_cow")
        spark.catalog.dropTempView("vt_cow")


def test_or_replace_moves_view_to_end_of_refresh_order(spark):
    """Redefining an EARLY view to reference a LATER-created view must
    re-analyze after its new dependency on refresh, or it would capture
    the dependent's stale pre-refresh plan (ADVICE round 3)."""
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("vt_ord")
    try:
        create_view(spark, "v_early", "SELECT x FROM vt_ord")
        create_view(spark, "v_late", "SELECT x * 100 AS x FROM vt_ord")
        # redefine the early view on top of the later one
        create_view(spark, "v_early", "SELECT x FROM v_late", or_replace=True)
        assert list(list_views(spark))[-1] == "v_early"
        spark.createDataFrame([(7,)], "x int").createOrReplaceTempView("vt_ord")
        refresh_views(spark)
        # v_late must have been refreshed BEFORE v_early re-analyzed
        assert spark.table("v_early").collect()[0]["x"] == 700
    finally:
        drop_view(spark, "v_early")
        drop_view(spark, "v_late")
        spark.catalog.dropTempView("vt_ord")
