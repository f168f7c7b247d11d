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
