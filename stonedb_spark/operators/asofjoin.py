"""As-of (point-in-time) join — an operator the reference engine lacks
entirely (its join surface is hash/sort equi- and θ-joins over
MultiIndex dimensions, storage/tianmu/optimizer/joiner.h:50) and Spark
has no native verb for, but every time-series / attribution pipeline
needs: for each left row, the single most recent right row with the
same key whose timestamp is <= the left row's.

Spark-first strategy — the union + keyed-window trick, NOT a range
cross-join:

  1. tag both inputs and union them by name (right payload packed into
     ONE struct column, so a right row is recognizable even when every
     payload field is NULL);
  2. one window per key ordered by (ts, side) where the right side
     sorts first at timestamp ties — making the match inclusive
     (right.ts == left.ts matches, same as DuckDB/pandas ``<=``);
  3. ``last(struct, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
     CURRENT ROW carries the latest right payload forward;
  4. keep left rows, unpack the struct.

Cost at scale: exactly ONE shuffle (hash-partition by key) plus a
per-key sort — the same price as the equi-join Spark would do anyway;
no range-bucketed cross join, no per-row probe.  Skewed keys behave
like any skewed window (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "r_",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of LEFT join.  ``backward`` (default): most recent right row
    at or before the left row's ``ts``; ``forward``: earliest right row
    at or after it.  Unmatched left rows keep NULL payload.

    Forward is the time-mirror of backward — the same window scanned in
    descending ``ts`` order (still right-before-left at exact ties, so
    the match stays inclusive both ways).

    ``payload`` = right columns to carry (default: all except key+ts);
    they surface as ``{prefix}{name}`` plus ``{prefix}{ts}``.

    ``tolerance`` (e.g. ``"2 hours"``): a match farther than this from
    the left timestamp is nulled out (pandas merge_asof semantics) —
    applied AFTER the window, so it adds zero shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if payload is None:
        payload = [c for c in right.columns if c not in (on, ts)]

    packed = F.struct(
        F.col(ts).alias(ts), *[F.col(c).alias(c) for c in payload]
    )
    r = right.select(F.col(on), F.col(ts), packed.alias("_r"), F.lit(0).alias("_side"))
    l = left.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType)).withColumn(
        "_side", F.lit(1)
    )
    u = l.unionByName(r.select(on, ts, "_r", "_side"), allowMissingColumns=True)

    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        in_range = (
            F.col(f"_m.{ts}") >= F.col(ts) - iv
            if direction == "backward"
            else F.col(f"_m.{ts}") <= F.col(ts) + iv
        )
        matched = matched.withColumn(
            "_m", F.when(in_range, F.col("_m"))
        )
    out = matched.filter(F.col("_side") == 1).drop("_r", "_side")
    out = out.withColumn(f"{prefix}{ts}", F.col(f"_m.{ts}"))
    for c in payload:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_m.{c}"))
    return out.drop("_m")
