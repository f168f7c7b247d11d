"""Heavy hitters via two-pass Misra-Gries — frequent-item mining that
never materializes the full vocabulary (the exact groupBy's weakness at
100 TB: the shuffle carries every distinct item).

Pass 1 (candidates): each Arrow batch folds into a Misra-Gries summary
of size ``k`` (Misra & Gries 1982): count matches, allocate new slots
while free, otherwise decrement ALL slots — the classic guarantee is
that any item with true frequency > n/k survives in SOME partition's
summary, so the union of per-partition summaries is a superset of the
global heavy hitters (Agarwal et al., "Mergeable Summaries", PODS'12).
Only |partitions| × k candidate rows ever leave the executors.

Pass 2 (exact recount): one filtered aggregation counts ONLY the
candidate set (broadcast semi-join) — exact counts, no vocabulary-wide
shuffle.  Output = items with exact count > n/k: identical to what the
full groupBy would return, at a fraction of the shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        slots: dict[str, int] = {}
        for b in batches:
            for item in b[col]:
                if item in slots:
                    slots[item] += 1
                elif len(slots) < k:
                    slots[item] = 1
                else:
                    dead = [it for it in slots if slots[it] == 1]
                    for it in slots:
                        slots[it] -= 1
                    for it in dead:
                        del slots[it]
        yield pd.DataFrame({"item": list(slots.keys())})

    return df.select(F.col(col).alias(col)).mapInPandas(
        summarize, "item string"
    )


def heavy_hitters(df: DataFrame, col: Column | str, k: int = 50) -> DataFrame:
    """Items of ``col`` with exact count > n/k, as (item, n) — equal to
    the exact groupBy answer by the Misra-Gries superset guarantee."""
    c = F.col(col) if isinstance(col, str) else col
    items = df.select(c.alias("item"))
    candidates = _mg_summaries(items, "item", k).distinct()
    total = items.count()
    counted = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total / k)
    )
    return counted
