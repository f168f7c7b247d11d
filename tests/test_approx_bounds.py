"""Bounds oracle for the approximate aggregates.

agg_approx_rough now carries its bounds verdicts in-query (driver
hash-checks them against literal TRUEs); this test independently
recomputes the RAW sketches and checks them against DuckDB exact
values, so a weakening of the query's internal checks can't slip
through unnoticed."""

from __future__ import annotations

from pyspark.sql import functions as F

from stonedb_spark.catalog import load_tables
from stonedb_spark.queries import all_queries


def test_query_verdicts_all_true(spark, oracle, sf_dir):
    rows = all_queries()["agg_approx_rough"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["nd_ok"] and r["p50_ok"] and r["p95_ok"], r


def test_raw_sketches_within_published_bounds(spark, oracle, sf_dir):
    l = load_tables(spark, sf_dir)["lineitem"]  # noqa: E741
    got = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), 10000).alias("price_p50"),
            F.percentile_approx("l_extendedprice", F.lit(0.95), 10000).alias("price_p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    exact = {
        r[0]: r
        for r in oracle.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_orderkey), COUNT(*) "
            "FROM lineitem GROUP BY l_returnflag"
        ).fetchall()
    }
    assert set(got) == set(exact)
    for flag, r in got.items():
        nd, n = exact[flag][1], exact[flag][2]
        assert r["n"] == n
        # HLL++ observed error is far below 5×rsd; deterministic sketch
        assert abs(r["approx_orders"] - nd) <= max(5, 0.25 * nd), (flag, r["approx_orders"], nd)
        # percentile_approx(accuracy=A): rank error <= n/A
        for col, q in (("price_p50", 0.5), ("price_p95", 0.95)):
            v = float(r[col])
            lo = oracle.execute(
                "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ? AND l_extendedprice < ?",
                [flag, v],
            ).fetchone()[0]
            hi = oracle.execute(
                "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ? AND l_extendedprice <= ?",
                [flag, v],
            ).fetchone()[0]
            tol = n / 10000 + 1
            assert lo - tol <= q * n <= hi + tol, (flag, col, v, lo, hi, q * n, tol)
