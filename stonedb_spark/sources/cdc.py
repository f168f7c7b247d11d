"""Change-data-capture: row-level snapshot diff and (streaming) apply.

The reference's freshness story is one-directional (delta store merged
into the columnar base, storage/tianmu/core/tianmu_table.cpp:1598);
a warehouse built on periodic full loads needs the reverse derivation
too — turn two snapshots into a change stream, and apply a change
stream to a stored table.  Q(pipeline_snapshot_diff) reports the
aggregate classes; this module is the row-level machinery.

Scale shape: diff is ONE full-outer join on the PK (both snapshots
shuffle once; bucketed layouts remove even that); apply is an anti-join
plus a union — state never lives on the driver.  The streaming apply
folds micro-batches through the same function via foreachBatch with a
staged-swap parquet write (the local stand-in for a transactional
table format's MERGE — on Delta/Iceberg this is one MERGE INTO with
snapshot isolation).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_COL = "_change"


def diff_snapshots(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Row-level CDC extract: one row per key whose state differs,
    tagged insert/delete/update in ``_change``; update/insert rows carry
    the NEW payload, delete rows the key only (payload NULL).

    Change detection compares columns directly (NULL-safe), never a
    stringified row hash — float formatting is engine-specific, column
    equality is not.
    """
    cols = [c for c in new.columns if c != key]
    o = old.select(F.col(key).alias("_ko"), *[F.col(c).alias(f"_o_{c}") for c in cols])
    n = new.select(F.col(key).alias("_kn"), *cols)
    j = o.join(n, F.col("_ko") == F.col("_kn"), "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    return (
        j.select(
            F.coalesce(F.col("_kn"), F.col("_ko")).alias(key),
            F.when(F.col("_ko").isNull(), "insert")
            .when(F.col("_kn").isNull(), "delete")
            .when(changed, "update")
            .alias(CHANGE_COL),
            *cols,
        )
        .filter(F.col(CHANGE_COL).isNotNull())
    )


def apply_changes(old: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply a diff_snapshots change set: delete/update keys drop out of
    the base, insert/update rows come in with their new payload.
    ``apply_changes(old, diff_snapshots(old, new, k), k)`` ≡ ``new``.
    """
    cols = [c for c in old.columns]
    touched = changes.select(F.col(key).alias("_tk"))
    survivors = old.join(touched, old[key] == F.col("_tk"), "left_anti")
    incoming = changes.filter(F.col(CHANGE_COL).isin("insert", "update")).select(*cols)
    return survivors.unionByName(incoming)


def run_streaming_apply(
    spark: SparkSession,
    changes_dir: str,
    target_path: str,
    checkpoint: str,
    schema,
    key: str,
) -> None:
    """Drain a directory of change-row files (availableNow) and fold each
    micro-batch into the parquet table at ``target_path`` with a staged
    swap.  Change batches may arrive in any number of files, and one
    micro-batch may drain files from SEVERAL successive diffs — a key
    changed in more than one diff would then appear multiple times, and
    apply_changes (anti-join + union) would keep every copy.  The fold
    therefore first collapses the batch to the LAST change per key,
    ordered by source-file modification time (file path as tie-break;
    files within one diff never repeat a key, so only cross-diff order
    matters and diffs are written sequentially).

    The swap renames the live table aside before promoting the staging
    copy (target -> target.old, staging -> target, drop target.old), so
    a crash at any point leaves either the old or the new table intact;
    on checkpoint replay the base loader falls back to ``.old`` rather
    than silently treating a missing target as an empty base.
    """
    backup = target_path + ".old"

    def fold(batch: DataFrame, batch_id: int) -> None:
        spark_l = batch.sparkSession
        if os.path.exists(target_path):
            base = spark_l.read.parquet(target_path)
        elif os.path.exists(backup):  # crashed between rename-aside and promote
            base = spark_l.read.parquet(backup)
        else:
            base = spark_l.createDataFrame(
                [], schema=batch.drop(CHANGE_COL, "_src_file", "_src_mtime").schema
            )
        from pyspark.sql import Window

        w = (
            Window.partitionBy(key)
            .orderBy(
                F.col("_src_mtime").desc(), F.col("_src_file").desc()
            )
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src_file", "_src_mtime")
        )
        merged = apply_changes(base, latest, key).localCheckpoint()
        staging = target_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(backup):
            shutil.rmtree(backup)
        if os.path.exists(target_path):
            os.rename(target_path, backup)
        os.rename(staging, target_path)
        shutil.rmtree(backup, ignore_errors=True)

    q = (
        spark.readStream.schema(schema)
        .parquet(changes_dir)
        # _metadata only resolves against the file-scan relation, so the
        # provenance columns are projected here, not inside foreachBatch
        .select(
            "*",
            F.col("_metadata.file_path").alias("_src_file"),
            F.col("_metadata.file_modification_time").alias("_src_mtime"),
        )
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
