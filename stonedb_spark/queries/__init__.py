"""Query registry.

Every implemented operator/query from SURVEY.md §2 registers itself here
with (a) a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` and
(b) an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
genuinely non-SQL-expressible operators, which get a weaker rows-only
check from the driver).  Column names are aliased identically on both
sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_MODULES = (
    "stonedb_spark.queries.tpch",
    "stonedb_spark.queries.dialect",
    "stonedb_spark.queries.relational",
    "stonedb_spark.queries.funcs",
    "stonedb_spark.queries.pipeline",
    "stonedb_spark.queries.dml",
    "stonedb_spark.queries.regress",
    "stonedb_spark.queries.regress_issues",
    "stonedb_spark.queries.graph",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
