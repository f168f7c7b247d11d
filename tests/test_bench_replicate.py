"""bench.replicate_tpch correctness: the synthetic sf-N× dataset must
preserve join fan-out and selectivities exactly (offset keys), scale
additive aggregates linearly, and keep dims fixed — otherwise the sf1
bench leg measures a different workload than TPC-H."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import replicate_tpch  # noqa: E402
from stonedb_spark.queries import all_queries  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("replica") / "sf2x")
    replicate_tpch(spark, SRC, dst, copies=2)
    return dst


def test_row_counts_scale_and_dims_fixed(spark, replica):
    for t in ("lineitem", "orders", "customer", "supplier", "part", "events"):
        a = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        b = spark.read.parquet(f"{replica}/{t}.parquet").count()
        assert b == 2 * a, (t, a, b)
    for t in ("nation", "region"):
        a = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        b = spark.read.parquet(f"{replica}/{t}.parquet").count()
        assert b == a, (t, a, b)


def test_join_fanout_preserved(spark, replica):
    l = spark.read.parquet(f"{replica}/lineitem.parquet")
    o = spark.read.parquet(f"{replica}/orders.parquet")
    c = spark.read.parquet(f"{replica}/customer.parquet")
    # every lineitem joins exactly one order; every order one customer
    assert l.join(o, l["l_orderkey"] == o["o_orderkey"]).count() == l.count()
    assert o.join(c, o["o_custkey"] == c["c_custkey"]).count() == o.count()
    # keys are globally unique after offsetting (no cross-copy collisions)
    assert o.select("o_orderkey").distinct().count() == o.count()
    assert c.select("c_custkey").distinct().count() == c.count()


def test_additive_aggregates_scale_linearly(spark, replica):
    q6 = all_queries()["tpch_q6"]
    base = q6.build(spark, SRC).collect()[0][0]
    twice = q6.build(spark, replica).collect()[0][0]
    assert abs(twice - 2 * base) < 1e-6 * abs(base), (base, twice)


def test_events_users_are_fresh_per_copy(spark, replica):
    src_e = spark.read.parquet(f"{SRC}/events.parquet")
    rep_e = spark.read.parquet(f"{replica}/events.parquet")
    assert rep_e.select("user_id").distinct().count() == 2 * src_e.select(
        "user_id"
    ).distinct().count()
    assert rep_e.select("event_id").distinct().count() == rep_e.count()
    # per-user stream sizes unchanged -> sessionization per user identical
    src_max = src_e.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    rep_max = rep_e.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert src_max == rep_max
