"""sf1-vs-sf5 TPC-H spot-check (round-11 VERDICT item 8).

Replicates the cached sf1 bench fixture 5x with bench.replicate_tpch's
key-shifted copies (join fan-outs and selectivities preserved; per-group
volumes scale 5x) and times q1/q6/q13/q18/q21 min-of-3 at both scales.
The per-query scaling exponent alpha = log(t5/t1)/log(5) validates the
plan-scalability claim between the local job-floor regime and the
baseline's SF100: a scan-bound plan should sit near alpha=1 (linear),
a floor-bound one near alpha=0, and anything super-linear (alpha >> 1)
is a plan that would NOT survive 100x.

Usage: python tools/sf5_spotcheck.py   (run IDLE: loadavg < 0.5 or the
numbers are discounted; prints the markdown table for BENCHMARKS.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from stonedb_spark import get_spark  # noqa: E402

QUERIES = ["tpch_q1", "tpch_q6", "tpch_q13", "tpch_q18", "tpch_q21"]
SF5_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata", "sf5",
)


def main() -> None:
    load0 = os.getloadavg()[0]
    spark = get_spark("sf5-spotcheck")
    if not all(
        os.path.exists(os.path.join(bench.SF1_DIR, f"{t}.parquet"))
        for t in ("lineitem", "orders", "customer", "nation", "region")
    ):
        bench.replicate_tpch(spark, bench.SF1_SRC, bench.SF1_DIR, copies=10)
    if not all(
        os.path.exists(os.path.join(SF5_DIR, f"{t}.parquet"))
        for t in ("lineitem", "orders", "customer", "nation", "region")
    ):
        print("building sf5 from sf1 (5 key-shifted copies)...")
        bench.replicate_tpch(spark, bench.SF1_DIR, SF5_DIR, copies=5)
    t1 = bench._time_battery(spark, QUERIES, bench.SF1_DIR, runs=3, warmup=1)
    t5 = bench._time_battery(spark, QUERIES, SF5_DIR, runs=3, warmup=1)
    print(f"\nloadavg_start {load0:.2f}")
    print("| query | sf1 min-of-3 | sf5 min-of-3 | ratio | alpha |")
    print("|---|---|---|---|---|")
    for q in QUERIES:
        r = t5[q] / t1[q]
        alpha = math.log(r) / math.log(5)
        print(f"| {q} | {t1[q]:.2f} | {t5[q]:.2f} | {r:.2f}x | "
              f"{alpha:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
