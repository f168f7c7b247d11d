"""Deterministic sampling & dataset splitting for training pipelines.

No reference counterpart (StoneDB has no TABLESAMPLE; MySQL 5.7's only
sampling is ORDER BY RAND(), which is neither scalable nor stable).
For corpus work the requirement is stronger than "random": the SAME row
must land in the SAME split on every engine, every partitioning, every
re-run — otherwise train/test contamination appears the first time the
pipeline is re-executed on different hardware.  rand()/sample() are
per-task-seeded in Spark (partitioning-dependent); content hashing is
the portable answer.

hash_bucket derives a uniform bucket in [0, n) from md5 of the key —
bit-identical in any engine with md5 (the DuckDB oracle inlines the
same arithmetic).  All downstream ops (split, p% sample) are plain
filters on that bucket: fully pushdown-friendly, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BUCKET_MOD = 10_000  # 0.01% split resolution


def hash_bucket(key: Column | str, buckets: int = _BUCKET_MOD) -> Column:
    """Uniform deterministic bucket in [0, buckets) from md5(key).

    15 hex chars = 60 bits → exact in int64; uniform mod small buckets."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    )


def split_assign(
    key: Column | str, train: float = 0.8, val: float = 0.1
) -> Column:
    """'train' / 'val' / 'test' label, deterministic per key."""
    b = hash_bucket(key)
    return (
        F.when(b < int(train * _BUCKET_MOD), "train")
        .when(b < int((train + val) * _BUCKET_MOD), "val")
        .otherwise("test")
    )


def sample_fraction(df, key: Column | str, fraction: float):
    """Deterministic ~fraction sample: filter on the hash bucket."""
    return df.filter(hash_bucket(key) < int(fraction * _BUCKET_MOD))
