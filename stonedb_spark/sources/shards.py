"""Training-shard export: the terminal sink of the data pipeline.

Packs documents into fixed-token-budget shards (the same
running-window discipline as Q(pipeline_sequence_pack)), writes one
parquet directory per shard, and emits a MANIFEST the training job can
trust: per-shard row count, token sum, and an order-insensitive CONTENT
checksum.  The per-row hash covers (doc_id, text) — not doc_id alone —
so payload corruption or substitution inside a shard is detected, not
just membership changes.  The fold is two commutative/associative
components joined as ``xorhex-sumhex``: an XOR of per-row hashes and a
wrapping SUM of the same hashes.  XOR alone cancels pairs of identical
rows (an even-count duplication would verify); the additive component
is multiplicity-sensitive, so together they catch both substitution
and duplication while staying computable in any partition order.

Scale shape: shard assignment is a per-source window (partition-
parallel) + one write shuffled on shard id; the manifest is one tiny
agg (#shards rows).  Nothing driver-side scales with corpus size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(
    docs: DataFrame,
    token_budget: int,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("source", "doc_id"),
) -> DataFrame:
    """Add ``shard`` = floor(running_tokens / budget) over a per-source
    running token window — deterministic, partition-parallel per source."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    w = (
        Window.partitionBy(order_cols[0])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.withColumn("_tok", n_tok).withColumn(
        "shard",
        F.concat_ws(
            "-",
            F.col(order_cols[0]),
            ((F.sum("_tok").over(w) - F.col("_tok")) / token_budget)
            .cast("long")
            .cast("string"),
        ),
    )


def _content_checksum(text_col: str) -> F.Column:
    """Order-insensitive, multiplicity-sensitive shard checksum over the
    (doc_id, text) payload: ``xorhex-sumhex`` of per-row 60-bit hashes.
    Unit separator \\x1f between fields so ('ab','c') != ('a','bc')."""
    h = (
        f"cast(conv(substring(md5(concat_ws('\\u001f', "
        f"cast(doc_id as string), {text_col})), 1, 15), 16, 10) as bigint)"
    )
    xor_part = (
        f"conv(cast(aggregate(collect_list({h}), 0L, (acc, x) -> acc ^ x)"
        " as string), 10, 16)"
    )
    # wrapping sum: fold in DECIMAL(38,0) (no int64 overflow), mod 2^60
    sum_part = (
        f"conv(cast(cast(sum(cast({h} as decimal(38,0)))"
        " % 1152921504606846976 as bigint) as string), 10, 16)"
    )
    return F.expr(f"concat({xor_part}, '-', {sum_part})")


def export_training_shards(
    docs: DataFrame, path: str, token_budget: int, text_col: str = "text"
) -> dict:
    """Write shard-partitioned parquet + _MANIFEST.json; returns the
    manifest dict (shard -> {rows, tokens, checksum})."""
    sharded = assign_shards(docs, token_budget, text_col)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    man_rows = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("_tok").alias("tokens"),
            _content_checksum(text_col).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        r["shard"]: {
            "rows": r["rows"],
            "tokens": r["tokens"],
            "checksum": r["checksum"],
        }
        for r in man_rows
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_shard(spark, path: str, shard: str, text_col: str = "text") -> bool:
    """Consumer-side check: recompute one shard's manifest entry."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    want = manifest[shard]
    got = (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("_tok").alias("tokens"),
            _content_checksum(text_col).alias("checksum"),
        )
        .collect()[0]
    )
    return (
        got["rows"] == want["rows"]
        and got["tokens"] == want["tokens"]
        and got["checksum"] == want["checksum"]
    )
