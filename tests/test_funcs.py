"""MySQL-dialect scalar function battery vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from stonedb_spark.functions.mysql import mysql_format_to_jvm
from stonedb_spark.queries import all_queries
from stonedb_spark.testing import check_query

NAMES = sorted(n for n in all_queries() if n.startswith("func_"))


@pytest.mark.parametrize("name", NAMES)
def test_func_matches_oracle(spark, oracle, sf_dir, name):
    q = all_queries()[name]
    problems = check_query(spark, oracle, q, sf_dir)
    assert not problems, f"{name}: {problems}"


def test_mysql_format_translation():
    assert mysql_format_to_jvm("%Y-%m-%d") == "yyyy-MM-dd"
    assert mysql_format_to_jvm("%H:%i:%s") == "HH:mm:ss"
    assert mysql_format_to_jvm("%d/%m/%y") == "dd/MM/yy"
    assert mysql_format_to_jvm("%%") == "'%'"
    with pytest.raises(ValueError):
        mysql_format_to_jvm("%Q")


def test_mysql_collation_and_pad_semantics(spark):
    """ci_eq/pad_eq reproduce MySQL utf8_general_ci + PAD SPACE compare;
    mysql_date maps zero dates to NULL (common_definitions.h:53 policy)."""
    from pyspark.sql import functions as F

    from stonedb_spark.functions import mysql as M

    df = spark.createDataFrame(
        [("abc", "ABC  "), ("abc ", "abc"), ("abc", "abd"), ("Straße", "STRASSE")],
        ["a", "b"],
    )
    got = df.select(
        M.ci_eq("a", "b").alias("ci"), M.pad_eq("a", "b").alias("pad")
    ).collect()
    assert [r["ci"] for r in got] == [True, True, False, False]
    assert [r["pad"] for r in got] == [False, True, False, False]

    d = spark.createDataFrame(
        [("0000-00-00",), ("1997-03-04",), (None,)], ["s"]
    ).select(M.mysql_date("s").alias("d"))
    vals = [r["d"] for r in d.collect()]
    assert vals[0] is None and vals[2] is None
    assert str(vals[1]) == "1997-03-04"


def test_session_variables_user_var_analog(spark):
    """MySQL user variables (func_define.test, user_function.test):
    Spark 4 SQL session variables are the engine analog."""
    spark.sql("DECLARE OR REPLACE VARIABLE v_min_size INT DEFAULT 10")
    spark.sql("SET VAR v_min_size = 25")
    got = spark.sql("SELECT v_min_size AS v, v_min_size * 2 AS v2").collect()[0]
    assert (got.v, got.v2) == (25, 50)
