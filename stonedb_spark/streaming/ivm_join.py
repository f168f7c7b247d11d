"""Incrementally-maintained JOIN view (delta-join IVM).

The reference refreshes joins by merging its delta store into the
columnar base and re-running the whole query (MergeDeltaTable,
storage/tianmu/core/tianmu_table.cpp:1598 — recompute-on-read).  The
Spark-native upgrade maintains the JOIN RESULT itself with the
classic incremental-view-maintenance algebra for append-only sides:

    J' = J  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

where A/B are the states BEFORE the batch and ΔA/ΔB the batch deltas.
The three delta terms are disjoint from J and from each other (every
output row pairs at least one delta row, and (old,old) pairs are
exactly J), so for append-only inputs the maintained view is
row-identical to the full recompute at every step — pinned by the
parity test and an oracle-backed registry entry.

At 100 TB the asymmetry is the point: |Δ| is batch-sized while |A|,|B|
are corpus-sized, so ΔA⋈B and A⋈ΔB broadcast the DELTA side —
per-batch cost is two big-side scans (one each) pruned by the
broadcast hash, never a corpus×corpus shuffle; with the states laid
out partitioned/bucketed by the join key the scans prune to matching
buckets.  ΔA⋈ΔB is batch×batch.  The view itself only ever APPENDS,
so J needs no rewrite — exactly the cheap path the reference's
recompute-on-read cannot take.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def delta_join(
    a_state: DataFrame | None,
    b_state: DataFrame | None,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    key: str,
) -> DataFrame | None:
    """The new JOIN rows contributed by one batch of deltas: every
    pair with at least one delta member.  Returns None when no term
    applies (both deltas empty/absent)."""
    from pyspark.sql.functions import broadcast

    terms = []
    if delta_a is not None and b_state is not None:
        terms.append(broadcast(delta_a).join(b_state, key))
    if a_state is not None and delta_b is not None:
        terms.append(a_state.join(broadcast(delta_b), key))
    if delta_a is not None and delta_b is not None:
        terms.append(delta_a.join(delta_b, key))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def _append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    return spark.read.parquet(path) if os.path.exists(path) else None


def apply_join_delta(
    spark: SparkSession,
    workdir: str,
    key: str,
    delta_a: DataFrame | None = None,
    delta_b: DataFrame | None = None,
) -> None:
    """Fold one batch of deltas (either or both sides) into the
    maintained state under ``workdir`` ({a,b,view} parquet dirs).
    Join rows are computed against the PRE-batch states, then the
    delta rows are appended to their side — appends only, no state
    rewrite anywhere."""
    a_dir, b_dir, j_dir = (
        os.path.join(workdir, n) for n in ("a", "b", "view")
    )
    a_state = _read_or_none(spark, a_dir)
    b_state = _read_or_none(spark, b_dir)
    new_j = delta_join(a_state, b_state, delta_a, delta_b, key)
    if new_j is not None:
        _append(new_j, j_dir)
    if delta_a is not None:
        _append(delta_a, a_dir)
    if delta_b is not None:
        _append(delta_b, b_dir)


def run_streaming_left_ivm(
    spark: SparkSession,
    left_src: str,
    left_schema,
    workdir: str,
    key: str,
    checkpoint_dir: str,
) -> None:
    """Streaming twin: LEFT deltas arrive as a file stream (one
    micro-batch per file, availableNow drains and stops) and fold
    through the same algebra; the right side takes its deltas between
    runs via apply_join_delta(delta_b=...).  Mirrors matview's
    foreachBatch shape — state lives in parquet, restart-safe via the
    stream checkpoint."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_join_delta(batch.sparkSession, workdir, key, delta_a=batch)

    (
        spark.readStream.schema(left_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(left_src)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# Weighted (retraction) form: rows carry a signed multiplicity column
# ``_w`` (+1 insert, -1 delete / the retraction half of an update), the
# DBSP/differential-dataflow encoding.  Join contributions multiply
# weights (a retracted left row cancels every pair it once produced),
# so the SAME three-term algebra maintains the view under DML — the
# capability the reference reaches by re-merging its delta store.  The
# view stays append-only; ``consolidate`` nets the multiplicities out
# (run it lazily at read time, or periodically as compaction).
def delta_join_weighted(
    a_state: DataFrame | None,
    b_state: DataFrame | None,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    key: str,
) -> DataFrame | None:
    """Like delta_join, for frames carrying ``_w``: output weight is
    the product of the two input weights."""
    from pyspark.sql.functions import broadcast, col

    def _pair(left, right, bc):
        l = left.withColumnRenamed("_w", "_wl")
        r = right.withColumnRenamed("_w", "_wr")
        if bc == "l":
            l = broadcast(l)
        elif bc == "r":
            r = broadcast(r)
        return (
            l.join(r, key)
            .withColumn("_w", col("_wl") * col("_wr"))
            .drop("_wl", "_wr")
        )

    terms = []
    if delta_a is not None and b_state is not None:
        terms.append(_pair(delta_a, b_state, "l"))
    if a_state is not None and delta_b is not None:
        terms.append(_pair(a_state, delta_b, "r"))
    if delta_a is not None and delta_b is not None:
        terms.append(_pair(delta_a, delta_b, None))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def consolidate(df: DataFrame) -> DataFrame:
    """Net the signed multiplicities: group by every payload column,
    keep rows with a positive net weight (``_w`` = the net count).
    One shuffle over the view — the compaction analog of the
    reference's background merge."""
    from pyspark.sql.functions import col
    from pyspark.sql.functions import sum as fsum

    cols = [c for c in df.columns if c != "_w"]
    return (
        df.groupBy(*cols)
        .agg(fsum("_w").alias("_w"))
        .filter(col("_w") > 0)
    )


def left_view(
    a_state: DataFrame,
    inner_view: DataFrame,
    key: str,
    right_cols: list[str],
) -> DataFrame:
    """LEFT-join view derived at read time from the maintained pieces:
    LJ = consolidate(inner) ∪ (net left rows with NO inner match,
    null-extended).  Nothing extra is maintained — the anti-join is
    against the inner view's key set, so a later right-side insert
    flips a left row from null-extended to matched exactly when the
    inner algebra adds its pairs (and a right delete flips it back
    when they cancel).  One extra anti-join per read; at scale both
    sides are key-partitioned state, so it bucket-prunes like the
    delta terms."""
    from pyspark.sql.functions import col, lit

    inner = consolidate(inner_view)
    matched_keys = inner.select(key).distinct()
    net_a = consolidate(a_state)
    unmatched = net_a.join(matched_keys, key, "left_anti")
    for c in right_cols:
        unmatched = unmatched.withColumn(c, lit(None))
    return inner.unionByName(unmatched.select(inner.columns))


def weighted_deltas_from_cdc(
    base: DataFrame, changes: DataFrame, key: str
) -> DataFrame:
    """Bridge sources/cdc.diff_snapshots output into IVM deltas.  A
    CDC delete/update row carries the key but not the BEFORE image;
    the retraction needs the old payload, so it is fetched from the
    maintained base state with one key-join (the base is exactly what
    the view holder already has).  Inserts and update-AFTER images are
    +1 rows straight from the change set.  Result: signed rows whose
    fold moves the view from base to the new snapshot."""
    from pyspark.sql.functions import broadcast, col, lit

    cols = [c for c in base.columns if c != "_w"]
    # The caller may pass UNCONSOLIDATED weighted state (multiple
    # physical rows per key — the representation the append-only views
    # maintain).  Joining the raw frame would stamp a -1 on EVERY
    # physical row and over-retract, so net the state to one logical
    # row per payload first; a plain snapshot (no _w) passes through.
    if "_w" in base.columns:
        base = consolidate(base)
    retract_keys = changes.filter(
        col("_change").isin("delete", "update")
    ).select(col(key).alias("_rk"))
    retractions = (
        base.select(*cols)
        .join(broadcast(retract_keys), col(key) == col("_rk"))
        .drop("_rk")
        .withColumn("_w", lit(-1))
    )
    insertions = (
        changes.filter(col("_change").isin("insert", "update"))
        .select(*cols)
        .withColumn("_w", lit(1))
    )
    return retractions.unionByName(insertions)
