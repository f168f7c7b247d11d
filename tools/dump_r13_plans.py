"""Dump `.explain("formatted")` for registered queries into plans/r13/.

The round-12 judge checks plan claims against committed files:
    plans/r13/<query>_before.txt   (captured before a change)
    plans/r13/<query>_after.txt    (captured after)

Usage:
    python tools/dump_r13_plans.py before tpch_q1 knn_pq_adc ...
    python tools/dump_r13_plans.py after  knn_pq_adc
    python tools/dump_r13_plans.py before --all      # every headline query

Plans are captured from the UNEXECUTED frame (AdaptiveSparkPlan initial
plan) — deterministic, independent of runtime re-planning — which is
what the static plan gates in tests/test_plans.py also read.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stonedb_spark import get_spark  # noqa: E402
from stonedb_spark.plans.inspect import formatted_plan  # noqa: E402
from stonedb_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    qs = all_queries()
    if names == ["--all"]:
        import bench

        names = [n for n in sorted(qs) if n.startswith(bench.HEADLINE_PREFIXES)]
        names += [n for n in bench.HEADLINE_EXTRA if n in qs]
    spark = get_spark("stonedb_spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name].build(spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(path)


if __name__ == "__main__":
    main()
