"""stonedb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of StoneDB's Tianmu engine (reference:
stoneatom/stonedb, surveyed in SURVEY.md).

Design stance (SURVEY.md §7): the reference's value is (a) a
MySQL-compatible OLAP SQL surface over flat columnar tables, (b) columnar
storage with aggressive data skipping, (c) HTAP ingest freshness.  In Spark
those become (a) ``spark.sql`` + a thin dialect/compat layer, (b) Parquet +
Catalyst pushdown + layout tuning, (c) micro-batch append / merge-as-join.
Everything here is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; no driver-side materialization, no collect-based
algorithms — every operator is a pure distributed plan that scales from
local[32] to a 1000-executor cluster.
"""

from stonedb_spark.session import get_spark
from stonedb_spark.catalog import load_tables, sql, TABLES

__all__ = ["get_spark", "load_tables", "sql", "TABLES"]

__version__ = "0.1.0"
