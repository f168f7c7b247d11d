"""Streaming deduplication — the incremental analog of dedup_exact.

No reference counterpart (SURVEY §2.10: the reference has no streaming
operators; its nearest machinery is insert dup-checking through the
RocksDB PK index, TianmuTableIndex dup-check on insert,
storage/tianmu/index/tianmu_table_index.h:58-61).  For a training-data
pipeline this is the ingest-side guard: drop re-delivered / re-crawled
records before they land in the corpus, instead of re-running batch
dedup over 100 TB.

Scale shape: dropDuplicatesWithinWatermark keys the state store by the
dedup key and GCs every key once the watermark passes it — state is
bounded by (arrival rate × watermark horizon), NOT by corpus size.
Plain dropDuplicates on a stream would grow state forever; the
watermarked variant is the only 100 TB-safe form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    within: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``key_cols`` were already seen within the
    watermark horizon.  ``within`` bounds both dedup reach and state."""
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        key_cols
    )
