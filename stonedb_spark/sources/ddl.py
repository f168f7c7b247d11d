"""DDL analogs: TRUNCATE / ALTER TABLE add/drop column.

Reference: TianmuTable::Truncate / TianmuTable::Alter
(storage/tianmu/core/tianmu_table.h:74-76); MTR coverage
mysql-test/suite/tianmu/t/add_column.test, drop_column.test.

In a lakehouse the analogs are metadata/layout operations:
* TRUNCATE — overwrite the table location with an empty frame of the
  same schema (constant-time on object stores that support prefix
  delete; never a row-by-row delete).
* ADD COLUMN — schema evolution: existing files stay untouched, the new
  column materializes as NULL (here: rewrite with a literal because
  plain parquet has no evolution log; the operator contract — old rows
  read as NULL, new schema visible — is the same one Delta provides via
  `mergeSchema`).
* DROP COLUMN — projection rewrite (Delta: pure metadata).
"""

from __future__ import annotations

import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _rewrite(df: DataFrame, path: str) -> None:
    """Copy-on-write rewrite: stage to a sibling dir, then swap.

    Reading lazily from ``path`` while overwriting the same ``path``
    deletes the source files mid-scan; a transactional table format
    (Delta) makes this a log commit — on plain parquet the staging dir +
    directory swap provides the same never-in-place discipline.
    """
    staging = path.rstrip("/") + ".__staging__"
    df.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    shutil.move(staging, path)


def truncate_table(spark: SparkSession, path: str) -> None:
    """Empty the table at ``path`` keeping its schema."""
    schema = spark.read.parquet(path).schema
    shutil.rmtree(path)
    spark.createDataFrame([], schema).write.parquet(path)


def add_column(
    spark: SparkSession, path: str, name: str, dtype: str, default: Column | None = None
) -> None:
    """ALTER TABLE ADD COLUMN: existing rows get NULL (or ``default``)."""
    df = spark.read.parquet(path)
    value = (default if default is not None else F.lit(None)).cast(dtype)
    _rewrite(df.withColumn(name, value), path)


def drop_column(spark: SparkSession, path: str, name: str) -> None:
    """ALTER TABLE DROP COLUMN: projection rewrite."""
    _rewrite(spark.read.parquet(path).drop(name), path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_table(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """OPTIMIZE analog: rewrite a many-small-files table into
    ~target-size files; returns the new file count.

    This is the reference's background delta-merge
    (TianmuTable::MergeDeltaTable, storage/tianmu/core/
    tianmu_table.cpp:1598; merge loop engine.cpp:1454): streaming/
    delayed appends accumulate small files (delta-store rows), and a
    maintenance pass folds them into full-size columnar files so scans
    read few large row groups instead of many tiny ones.  File count =
    ceil(bytes / target) — measured from the actual on-disk footprint,
    never a row count collected to the driver.  On Delta this is
    OPTIMIZE (+ Z-ORDER); on plain parquet it is a staged rewrite.
    """
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    _rewrite(df.repartition(n_files), path)
    return n_files


def optimize_zorder(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    group_bytes: int = 1 << 20,
) -> int:
    """OPTIMIZE ... ZORDER BY analog: one maintenance pass that both
    compacts small files AND clusters the rewrite on the Morton key of
    ``cols`` (operators/zorder.py), so subsequent multi-column range
    scans prune row groups on every listed column.  This is the full
    lakehouse maintenance verb: compact_table alone fixes file sizing,
    this also fixes ROW ORDER.  Returns the new file count."""
    import os

    from pyspark.sql import functions as F

    from stonedb_spark.operators.zorder import zvalue

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    keyed = df.withColumn("_z", zvalue([F.col(c) for c in cols]))
    clustered = (
        keyed.repartitionByRange(n_files, "_z").sortWithinPartitions("_z").drop("_z")
    )
    staging = path + ".zorder_staging"
    clustered.write.mode("overwrite").option(
        "parquet.block.size", group_bytes
    ).parquet(staging)
    backup = path + ".old"
    if os.path.exists(backup):
        import shutil

        shutil.rmtree(backup)
    os.rename(path, backup)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(backup, ignore_errors=True)
    return n_files
