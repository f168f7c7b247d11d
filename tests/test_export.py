"""Export / CTAS sinks (SELECT INTO OUTFILE + INSERT..SELECT parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonedb_spark.catalog import load_tables
from stonedb_spark.queries import all_queries
from stonedb_spark.sources.export import ctas_parquet, export_csv


def test_export_csv_roundtrip(spark, sf_dir, tmp_path):
    q1 = all_queries()["tpch_q1"].build(spark, sf_dir)
    out = str(tmp_path / "q1_csv")
    export_csv(q1, out, sep="|", single_file=True)
    back = spark.read.option("sep", "|").option("header", "true").csv(out)
    assert back.count() == q1.count()
    assert back.columns == q1.columns


def test_ctas_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = load_tables(spark, sf_dir)["orders"]
    derived = src.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_f")
    ctas_parquet(derived, out)
    back = spark.read.parquet(out)
    assert back.count() == derived.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}
