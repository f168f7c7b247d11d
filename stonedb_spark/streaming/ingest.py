"""Structured Streaming ingest + incremental aggregation.

The reference's only stream-ish machinery is HTAP ingest freshness: a
delayed-insert circular buffer drained by a background merge thread into
the columnar base (Engine::InsertDelayed / the merge loop,
storage/tianmu/core/engine.cpp:1683,1454) plus the RocksDB delta store
(storage/tianmu/core/delta_table.h:37).  SURVEY §2.10: no streaming
query operators exist.

Spark mapping (and beyond-parity extension): Structured Streaming file
source → micro-batch append (the delayed-insert analog, read-your-writes
via the sink table) and a watermarked tumbling-window aggregation (the
incremental version of the ``events_time_window`` batch query — same
logical plan, incrementally maintained state store at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stonedb_spark.functions.exact import DEC


def stream_events(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """File-source stream over an events directory (parquet files appear
    as producers drop them — the circular-buffer analog)."""
    return spark.readStream.schema(schema).parquet(src_dir)


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked hourly tumbling-window aggregation.

    Late rows beyond the watermark are dropped (state GC) — the
    streaming-correct version of events_time_window; state size is
    bounded by (windows in watermark horizon × event types).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_append_ingest(
    spark: SparkSession, src_dir: str, target_dir: str, checkpoint_dir: str, schema
) -> None:
    """Micro-batch append of newly-arrived event files into the columnar
    base — the delayed-insert → background-merge analog.  Trigger
    availableNow processes the backlog then stops (test-friendly; in
    production the trigger would be continuous micro-batches)."""
    stream = stream_events(spark, src_dir, schema)
    (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream–static enrichment join: each micro-batch equi-joins the
    arriving rows against a (broadcast) dimension snapshot — the
    streaming version of the map-join dimension lookup
    (JoinerMapped, storage/tianmu/optimizer/joiner_mapped.h:32).
    Stateless: no watermark needed for stream-static inner joins; the
    dim side is re-resolved per micro-batch, so a slowly-changing
    dimension picks up updates between batches.  At scale the dim stays
    under the broadcast threshold or the join degrades to shuffled —
    either way state size is zero."""
    return stream.join(F.broadcast(dim), on, "inner")


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream–stream inner equi-join with an event-time interval bound:
    pair each left row with right rows of the same ``key`` whose ``ts``
    falls in [left.ts, left.ts + interval] — the view→click attribution
    shape.

    Both inputs are watermarked and the join carries a time-range
    predicate, which is exactly what lets Structured Streaming bound
    and garbage-collect the buffered state on BOTH sides (state for
    rows older than watermark + interval is dropped); without the
    range condition the state would grow forever.  The join shuffles
    on the equi-key only; the range bound is evaluated within matched
    key groups.  At 1000 executors state is hash-partitioned by key —
    skewed hot keys are the thing to watch (salt upstream if one key
    dominates)."""
    lw = left.withWatermark("ts", watermark).alias("l")
    rw = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("r.ts").alias("right_ts"),
    )
