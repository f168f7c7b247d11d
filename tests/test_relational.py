"""Relational operator battery vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from stonedb_spark.queries import all_queries
from stonedb_spark.testing import check_query

NAMES = sorted(
    n
    for n in all_queries()
    if n.split("_")[0]
    in ("pred", "agg", "join", "sort", "distinct", "union", "subq", "case", "window", "rollup", "pivot", "sql")
)


@pytest.mark.parametrize("name", NAMES)
def test_relational_matches_oracle(spark, oracle, sf_dir, name):
    q = all_queries()[name]
    problems = check_query(spark, oracle, q, sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", NAMES)
def test_relational_nonempty(spark, sf_dir, name):
    q = all_queries()[name]
    assert q.build(spark, sf_dir).count() > 0, f"{name} returned no rows"


def test_sql_facade_runs_reference_style_text(spark, oracle, sf_dir):
    """A reference user's SQL text (the ssb_small.test / Q19 disjunct
    shape, mysql-test/suite/tianmu/t/ssb_small.test:58-75) runs
    unchanged through the sql() facade over the registered views."""
    from stonedb_spark import sql as run_sql
    from stonedb_spark.testing import compare_frames

    text = """
        select p_brand, sum(l_extendedprice * (1 - l_discount)) as revenue
        from lineitem, part
        where p_partkey = l_partkey
          and l_quantity >= 2 and l_quantity <= 2 + 10
          and p_size between 1 and 5
          and l_shipdate between date '1995-01-01' and date '1996-12-31'
        group by p_brand
        order by p_brand
    """
    got = run_sql(spark, text, sf_dir).toPandas()
    want = oracle.execute(
        text.replace("sum(l_extendedprice * (1 - l_discount))",
                     "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)")
    ).df()
    got["revenue"] = got["revenue"].astype("float64")
    assert not compare_frames(got, want)


def test_asof_join_ties_and_null_payload(spark):
    """Inclusive match at equal timestamps; a right row whose payload
    value is genuinely NULL must still win over an older non-null row
    (the struct packing prevents last(ignorenulls) from skipping it);
    unmatched left rows keep NULL payload."""
    import datetime as dt

    from stonedb_spark.operators.asofjoin import asof_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(20)), (3, 2, ts(5)), (4, 3, ts(1))],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100.0),   # tie with event 1 -> matches (inclusive)
         (1, ts(15), None),    # NULL payload, newest before event 2
         (2, ts(4), 7.0)],
        ["k", "ts", "value"],
    )
    got = {
        r["event_id"]: (r["r_ts"], r["r_value"])
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert got[1] == (ts(10), 100.0)      # inclusive tie
    assert got[2] == (ts(15), None)       # NULL payload carried, not skipped
    assert got[3] == (ts(4), 7.0)
    assert got[4] == (None, None)         # no match at all


def test_asof_join_property_vs_pandas(spark):
    """Property check against pandas merge_asof on randomized keyed
    series (seeded Hypothesis-style sweep without per-example Spark
    jobs — one composite frame per config, many keys per frame):
    backward, forward, and tolerance semantics must all agree."""
    import numpy as np
    import pandas as pd

    from stonedb_spark.operators.asofjoin import asof_join

    rng = np.random.default_rng(7)
    for trial, (direction, tol) in enumerate(
        [("backward", None), ("forward", None),
         ("backward", "5 seconds"), ("forward", "7 seconds")]
    ):
        n_l, n_r = 120, 90
        base = pd.Timestamp("2024-03-01")
        lpdf = pd.DataFrame({
            "k": rng.integers(0, 8, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 3000, n_l), unit="s"),
            "lid": np.arange(n_l),
        }).sort_values("ts", kind="stable")
        rpdf = pd.DataFrame({
            "k": rng.integers(0, 8, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 3000, n_r), unit="s"),
            "val": rng.normal(size=n_r).round(6),
        }).sort_values("ts", kind="stable")
        # merge_asof needs unique (k, ts) on the right for a clean
        # comparison (tie choice within equal ts is impl-defined)
        rpdf = rpdf.drop_duplicates(subset=["k", "ts"], keep="last")

        expect = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k",
            direction=direction, allow_exact_matches=True,
            tolerance=pd.Timedelta(tol) if tol else None,
        ).sort_values("lid")

        got = (
            asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                on="k", ts="ts", payload=["val"],
                direction=direction, tolerance=tol,
            )
            .select("lid", "r_val")
            .toPandas()
            .sort_values("lid")
        )
        g = got["r_val"].to_numpy(dtype=float)
        e = expect["val"].to_numpy(dtype=float)
        both_nan = np.isnan(g) & np.isnan(e)
        assert bool(np.all(both_nan | (g == e))), (
            trial, direction, tol,
            [(i, g[i], e[i]) for i in range(len(g)) if not (both_nan[i] or g[i] == e[i])][:5],
        )
