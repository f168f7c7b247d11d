"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q3 shape) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
beyond-reference pipeline operators; each callable is
``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin per query (omitted only
for genuinely non-SQL-expressible operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stonedb_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["tpch_q1"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }
