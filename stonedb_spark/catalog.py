"""Table catalog: load the driver-provided parquet fixtures as temp views.

Mirrors the reference's table layer (TianmuTable,
storage/tianmu/core/tianmu_table.h:65): a flat relational catalog of
columnar tables.  Packs/DPNs (storage/tianmu/data/dpn.h:35-72) map to
Parquet row groups + statistics, which Spark's scan already prunes on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every fixture table and register it as a temp view.

    Reads are lazy; registering all ten costs only metadata.  Column
    pruning + predicate pushdown reach the parquet scan because the views
    are plain file scans (verify with ``df.explain('formatted')`` —
    PushedFilters/ReadSchema lines).
    """
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if name == "events":
            # fixture stores ts as timestamp[ns]; Spark reads it as long
            # (spark.sql.legacy.parquet.nanosAsLong) → convert to µs
            # timestamps, matching DuckDB's ns→µs pandas truncation.
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
            )
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
