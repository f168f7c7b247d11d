"""Sliding-window trending terms over an event stream.

Beyond the reference (no streaming surface there; its freshness story is
the delta-store merge, storage/tianmu/core/tianmu_table.cpp:1598): the
"what's hot right now" query a feed/monitoring pipeline keeps warm.

Shape: watermarked SLIDING windows (window/slide) over the event-time
column, counting per (window, term).  Each event lands in
window/slide overlapping windows — Spark expands that map-side, and the
windowed count is an ordinary incremental streaming aggregation whose
state is bounded by (#open windows × #terms) and GC'd by the watermark.
The per-window top-k is a BATCH post-pass over the (tiny) aggregate
sink, not stream state: ranking inside the stream would need a window
function (unsupported) or custom state for something the closed-window
table answers with a partition-parallel row_number.

At scale nothing here depends on stream length: state is window-bounded,
the sink holds one row per (window, term), and the top-k rank reads the
sink only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trending_term_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
    term_col: str = "event_type",
) -> DataFrame:
    """Streaming (or batch — same expression) sliding-window term counts.

    Works unchanged on a batch frame, which is how the equivalence test
    pins streaming == batch semantics.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window("ts", window, slide).alias("w"),
            F.col(term_col).alias("term"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "term",
            "n",
        )
    )


def topk_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """Batch post-pass: rank terms within each closed window
    (deterministic ties by term)."""
    from pyspark.sql import Window

    w = Window.partitionBy("w_start", "w_end").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("w_start", "rnk")
    )
