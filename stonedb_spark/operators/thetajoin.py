"""Binned range join — the scale path for θ-joins.

The reference executes `<, >, <=, >=` join conditions with a sort-merge
"sort join" (JoinerSort::ExecuteJoinConditions,
storage/tianmu/optimizer/joiner_sort.cpp:30).  Spark has no native
range-join operator: a bare non-equi condition plans as
BroadcastNestedLoopJoin, which is O(n·m) and dies at 100 TB.

This operator rewrites *interval-containment* range joins
(``point BETWEEN lo AND hi``) into an equi-join on a bin key:

* each interval row is exploded to every bin of width ``bin_width`` it
  overlaps (bounded fan-out when intervals are short relative to the
  bin width);
* each point row maps to exactly one bin;
* the equi-join on ``__bin`` shuffles both sides by bin (co-located,
  AQE-skew-handled) and the residual BETWEEN filter removes false
  positives within a bin.

This is the standard "binning" range-join technique (as popularized by
the Databricks range-join optimization and common in genomics interval
joins); at 1000 executors it is a plain shuffled equi-join, no
nested-loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    point_col: str | Column,
    intervals: DataFrame,
    lo_col: str | Column,
    hi_col: str | Column,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` on lo <= point <= hi via bin keys.

    Column name collisions between the two inputs must be resolved by the
    caller (select/alias) beforehand, as with any Spark join.
    """
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    lo = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hi = F.col(hi_col) if isinstance(hi_col, str) else hi_col

    pts = points.withColumn("__bin", F.floor(p / F.lit(bin_width)).cast("long"))
    lo_bin = F.floor(lo / F.lit(bin_width)).cast("long")
    hi_bin = F.floor(hi / F.lit(bin_width)).cast("long")
    ivs = intervals.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))

    joined = pts.join(ivs, on="__bin", how=how).filter(p.between(lo, hi))
    return joined.drop("__bin")
