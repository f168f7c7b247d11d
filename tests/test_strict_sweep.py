"""CI gate: the WHOLE registry stays repr-strict (dtype + stringified
cell parity vs DuckDB) at sf0.001, regardless of which alphabetical
50-query window the round driver happens to check.  The driver hashes
stringified cells, so an int-vs-float dtype skew that the value-level
comparator tolerates is a driver hash mismatch — this sweep is the test
that catches it for all queries, not just the windowed ones."""

from __future__ import annotations


def test_strict_sweep_whole_registry(spark):
    from tools.strict_sweep import sweep

    n_bad = sweep((), sf_dir="/root/testdata/sf0.001")
    assert n_bad == 0, f"{n_bad} queries repr-diverge from oracle (see captured stdout)"
