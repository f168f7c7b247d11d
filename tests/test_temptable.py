"""TEMPORARY table lifecycle (temporary.test analog): create/insert/
query/drop, permanent-table shadowing and un-shadowing, duplicate
errors, and session-end cleanup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stonedb_spark.sources.temptable import (
    create_temp_table,
    drop_temp_table,
    end_session,
    insert_temp_table,
    is_temp_table,
)
from stonedb_spark.sources.views import NotATableError, ViewExistsError


def test_create_insert_query_drop(spark):
    df = spark.range(5).select(F.col("id").alias("x"))
    create_temp_table(spark, "tt_scratch", df)
    assert is_temp_table(spark, "tt_scratch")
    assert spark.table("tt_scratch").count() == 5
    # queries compose with permanent tables like any relation
    assert spark.sql("SELECT SUM(x) AS s FROM tt_scratch").collect()[0]["s"] == 10
    insert_temp_table(spark, "tt_scratch", spark.range(3).select(F.col("id").alias("x")))
    assert spark.table("tt_scratch").count() == 8
    with pytest.raises(ViewExistsError):
        create_temp_table(spark, "tt_scratch", df)
    drop_temp_table(spark, "tt_scratch")
    assert not is_temp_table(spark, "tt_scratch")
    with pytest.raises(NotATableError):
        drop_temp_table(spark, "tt_scratch")


def test_shadowing_permanent_table(spark):
    """temporary.test: a TEMPORARY table shadows a same-named permanent
    table for this session; DROP restores the permanent binding."""
    spark.createDataFrame([(1,), (2,)], "v int").createOrReplaceTempView("tt_perm")
    try:
        create_temp_table(spark, "tt_perm", spark.createDataFrame([(99,)], "v int"))
        assert [r["v"] for r in spark.table("tt_perm").collect()] == [99]
        drop_temp_table(spark, "tt_perm")
        assert sorted(r["v"] for r in spark.table("tt_perm").collect()) == [1, 2]
    finally:
        spark.catalog.dropTempView("tt_perm")


def test_session_end_cleanup(spark):
    create_temp_table(spark, "tt_a", spark.range(2))
    t_b = create_temp_table(spark, "tt_b", spark.range(3))
    path_b = t_b.inputFiles()[0]
    end_session(spark)
    assert not is_temp_table(spark, "tt_a") and not is_temp_table(spark, "tt_b")
    assert not spark.catalog.tableExists("tt_a")
    assert not os.path.exists(os.path.dirname(path_b.replace("file:", "")))
