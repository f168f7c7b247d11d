"""CSV loader reject-path (LOAD DATA parity) + Structured Streaming ingest."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from stonedb_spark.catalog import load_tables
from stonedb_spark.sources.csvload import read_csv_with_rejects
from stonedb_spark.streaming.ingest import (
    run_append_ingest,
    stream_events,
    windowed_event_counts,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)


def test_csv_load_with_rejects(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text(
        "1,alpha,10.5\n"
        "2,beta,20.25\n"
        "bad_id,gamma,1.0\n"      # unparseable int
        "3,delta,not_a_number\n"  # unparseable double
        "4,epsilon,40.0\n"
    )
    good, bad = read_csv_with_rejects(spark, str(csv), SCHEMA)
    good_rows = sorted(r.id for r in good.collect())
    bad_rows = sorted(r.raw for r in bad.collect())
    assert good_rows == [1, 2, 4]
    assert bad_rows == ["3,delta,not_a_number", "bad_id,gamma,1.0"]


def test_streaming_append_ingest_and_window(spark, sf_dir, tmp_path):
    """availableNow ingest must land every source row in the sink, and the
    watermarked windowed agg must equal the batch computation."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    events = load_tables(spark, sf_dir)["events"]
    sample = events.filter(F.col("event_id") % 17 == 0)
    sample.write.parquet(src, mode="overwrite")
    n_src = sample.count()

    schema = spark.read.parquet(src).schema
    run_append_ingest(spark, src, sink, ckpt, schema)
    assert spark.read.parquet(sink).count() == n_src

    # incremental windowed agg (availableNow, complete output to memory)
    stream = stream_events(spark, src, schema)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    from stonedb_spark.functions.exact import DEC

    expect = {
        (r.hour_start, r.event_type): (r.n_events, r.total_value)
        for r in sample.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert got == expect


def test_dml_queries(spark, oracle, sf_dir):
    from stonedb_spark.queries import all_queries
    from stonedb_spark.testing import check_query

    for name in sorted(n for n in all_queries() if n.startswith("dml_")):
        q = all_queries()[name]
        problems = check_query(spark, oracle, q, sf_dir)
        assert not problems, f"{name}: {problems}"
        assert q.build(spark, sf_dir).count() > 0
