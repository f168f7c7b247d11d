"""TPC-H-shaped query battery vs the DuckDB oracle (SURVEY.md §5 model)."""

from __future__ import annotations

import pytest

from stonedb_spark.queries import all_queries
from stonedb_spark.testing import check_query

TPCH = sorted(n for n in all_queries() if n.startswith("tpch_"))


@pytest.mark.parametrize("name", TPCH)
def test_tpch_query_matches_oracle(spark, oracle, sf_dir, name):
    q = all_queries()[name]
    problems = check_query(spark, oracle, q, sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", TPCH)
def test_tpch_query_nonempty(spark, sf_dir, name):
    q = all_queries()[name]
    assert q.build(spark, sf_dir).count() > 0, f"{name} returned no rows"
