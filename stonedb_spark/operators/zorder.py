"""Z-order (Morton) clustering for multi-column scan pruning.

The reference's Knowledge Grid prunes packs by per-pack min/max on
EVERY column (storage/tianmu/core/pack_guardian.h, SURVEY §3.1) — but
that only bites when the physical row order clusters the filtered
columns.  Sorting by one column destroys locality of the others;
interleaving the bits of several keys (the Morton curve) keeps ALL of
them range-clustered at once, so parquet row-group min/max statistics
(Spark's pack analog) prune 2-D/3-D box predicates instead of scanning
everything.  This is the standard lakehouse `OPTIMIZE ZORDER BY`
mechanic, built here from pure Catalyst bit arithmetic — no UDF, fully
codegen'd, and deterministic so an engine-independent oracle can check
the key itself.

Scale shape: computing the key is map-only; clustering is one
repartitionByRange + per-partition sort on the key (the same cost as
any CTAS with a sort), after which every future 2-D range scan prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of each integral column into one
    Morton key: column k contributes its bit i at output position
    i*len(cols)+k.  len(cols)*bits must be <= 63.

    Inputs are folded into [0, 2^bits) with pmod first: without the
    mask, values >= 2^bits or negatives would alias silently through
    the raw bit slice (shiftright of a negative long sign-extends),
    producing Morton keys that destroy the clustering the function
    exists to provide while preserving the data — an invisible layout
    bug.  pmod keeps equal inputs on equal keys, so correctness of any
    key-equality use is unaffected; range locality above 2^bits wraps,
    which is the documented trade of a fixed-width Morton code.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError("interleaved width must fit a signed long")
    out = F.lit(0).cast("long")
    for k, c in enumerate(cols):
        x = F.pmod(c.cast("long"), F.lit(1 << bits)).cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + k)
            )
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    partitions: int = 8,
    group_bytes: int = 1 << 18,
) -> None:
    """CTAS clustered on the Morton key of ``cols``: range-partition by
    the key, sort within partitions, small row groups
    (``parquet.block.size``) so min/max stats have pruning resolution —
    the knob a real table tunes per workload."""
    keyed = df.withColumn("_z", zvalue([F.col(c) for c in cols], bits))
    (
        keyed.repartitionByRange(partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", group_bytes)
        .parquet(path)
    )
