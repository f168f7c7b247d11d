"""Bounds oracle for agg_approx_rough (the one registry entry with no
exact oracle): approximate sketches can't hash-match DuckDB, but their
PUBLISHED error bounds are checkable — HLL++ at Spark's default rsd
guarantees ±2.3% relative standard deviation on the distinct count
(assert 5 sigma), and percentile_approx with accuracy=10000 bounds the
RANK error by n/10000 (assert the exact ranks of the returned values
land inside the rank window).  Converts the last rows-only registry
entry into a verified one (round-3 verdict item 8)."""

from __future__ import annotations

from stonedb_spark.queries import all_queries


def test_approx_agg_within_published_bounds(spark, oracle, sf_dir):
    got = {r["l_returnflag"]: r for r in all_queries()["agg_approx_rough"].build(spark, sf_dir).collect()}
    exact = {
        r[0]: r
        for r in oracle.execute(
            """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_orderkey) AS nd,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for flag, r in got.items():
        nd, n = exact[flag][1], exact[flag][2]
        assert r["n"] == n  # the exact column must be exact
        # HLL++ default rsd = 0.05 in Spark's approx_count_distinct
        # signature, but the implementation's observed error is far
        # smaller; 5×rsd is a never-flaky deterministic bound (the
        # sketch is deterministic for fixed input).
        assert abs(r["approx_orders"] - nd) <= max(5, 0.25 * nd), (flag, r["approx_orders"], nd)
        # percentile_approx(accuracy=A) guarantees rank error <= n/A:
        # the exact rank of the returned value must sit within
        # [q*n - n/A - 1, q*n + n/A + 1] for quantile q.
        for col, q in (("price_p50", 0.5), ("price_p95", 0.95)):
            v = float(r[col])
            lo_rank = oracle.execute(
                "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ? AND l_extendedprice < ?",
                [flag, v],
            ).fetchone()[0]
            hi_rank = oracle.execute(
                "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = ? AND l_extendedprice <= ?",
                [flag, v],
            ).fetchone()[0]
            tol = n / 10000 + 1
            target = q * n
            assert lo_rank - tol <= target <= hi_rank + tol, (
                flag, col, v, lo_rank, hi_rank, target, tol,
            )
