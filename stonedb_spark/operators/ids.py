"""Distributed contiguous ID assignment (zipWithIndex without an RDD).

The reference gets dense row ids for free from its single-node pack
layout (row number inside the pack + pack offset,
storage/tianmu/core/tianmu_table.cpp); a distributed engine has to
manufacture them.  ``monotonically_increasing_id`` is neither dense nor
stable, and ``row_number() OVER (ORDER BY ...)`` with no partition key
collapses the whole table into ONE task — the classic scale trap.

The scale-correct recipe (same as RDD.zipWithIndex, expressed in the
DataFrame API):

  1. range-repartition by the (unique) order key — Spark samples the
     key distribution and produces globally ordered, balanced ranges;
  2. count rows per physical partition (one tiny agg — #partitions
     rows to the driver, row-count-independent);
  3. broadcast the per-partition starting offsets back;
  4. id = offset[partition] + (row_number within partition) - 1.

One range shuffle + one bounded agg; no single-task sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame, order_cols: list[str], id_col: str = "row_id", partitions: int = 32
) -> DataFrame:
    """Add ``id_col`` = 0..n-1 following the total order of
    ``order_cols`` (which must be a unique key — ties across a range
    boundary would make the order, and therefore the ids, ambiguous).
    """
    ranged = df.repartitionByRange(partitions, *[F.col(c) for c in order_cols])
    tagged = ranged.withColumn("_pid", F.spark_partition_id())
    # bounded driver pull: one row per partition
    counts = sorted(
        (r["_pid"], r["n"])
        for r in tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off = tagged.sparkSession.createDataFrame(offsets, "_opid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(off), F.col("_pid") == F.col("_opid"))
        .withColumn(id_col, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_opid", "_offset")
    )
