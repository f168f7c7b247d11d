"""Result export — SELECT ... INTO OUTFILE parity.

Reference: exporter::select_tianmu_export / DataExporterTxt
(storage/tianmu/exporter/export2file.h:27) writes delimited text with
MySQL export options.  Spark equivalent: ``df.write.csv`` with the same
knobs; exports fan out one file per partition (coalesce for single-file
semantics only when the result is small — driver-bounded, never for big
data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    null_value: str = "\\N",
    single_file: bool = False,
    quote_all: bool = False,
) -> None:
    """``null_value`` defaults to MySQL's \\N outfile marker (the
    reference's @TIANMU_LOAD_NULL, issue1169.test); ``quote_all``
    mirrors FIELDS ENCLOSED BY '"' (every field wrapped, embedded
    quotes doubled — the exact format issue1169/issue790 LOAD back)."""
    out = df.coalesce(1) if single_file else df
    writer = (
        out.write.mode("overwrite")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("nullValue", null_value)
        .option("emptyValue", "")
    )
    if quote_all:
        writer = writer.option("quoteAll", True).option("escape", '"')
    writer.csv(path)


def ctas_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    codec: str | None = None,
) -> None:
    """CREATE TABLE AS SELECT analog (Engine::Execute SQLCOM_INSERT_SELECT,
    storage/tianmu/core/engine_execute.cpp:471): materialize a query
    result as a new columnar table.

    ``codec`` maps the reference's per-pack compression layer
    (storage/tianmu/compress/, lz4.test; README claims 10:1–40:1) onto
    parquet page compression: 'snappy' (default), 'zstd', 'lz4', 'gzip',
    'none'.  Like the reference, compression is a physical storage
    property — query plans and results are codec-independent (pinned by
    tests/test_export.py), and row-group stats pruning works identically
    under every codec.
    """
    writer = df.write.mode("overwrite")
    if codec:
        writer = writer.option("compression", codec)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def ctas_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC twin of ctas_parquet (beyond the reference's text-only
    exporter): ORC carries the same row-group-statistics pruning model
    as parquet, so a warehouse standardized on ORC gets identical
    scan-skipping semantics — format choice is a physical detail here,
    not a capability change."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def export_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines export — the sink twin of read_jsonl_with_rejects
    (training corpora interchange in JSONL far more often than CSV).
    One object per line, one file per partition unless coalesced."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
