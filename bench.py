#!/usr/bin/env python
"""Benchmark harness: run the headline query battery at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "tpch_total", "value": <sec>, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Compare against BASELINE.md (StoneDB TPC-H SF100 report): the shape to
stay within 2× of is the per-query ratio (cheap-scan Q6 vs join-heavy
Q18/Q21), not absolute wall-clock.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stonedb_spark import get_spark, load_tables  # noqa: E402
from stonedb_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the TPC-H battery (the reference's own benchmark corpus,
# BASELINE.md) plus the heaviest beyond-reference pipeline operators.
HEADLINE_PREFIXES = ("tpch_",)
HEADLINE_EXTRA = (
    "dedup_minhash_lsh",
    "dedup_clusters",
    "knn_bruteforce",
    "knn_ivf_probe",
    "text_tfidf_topk",
    "join_asof_backward",
)


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("stonedb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in sorted(qs) if n.startswith(HEADLINE_PREFIXES)]
    names += [n for n in HEADLINE_EXTRA if n in qs]

    # warm the JVM + file-listing caches once so per-query numbers measure
    # query execution, not session bootstrap
    for df in load_tables(spark, SF_DIR).values():
        df.count()

    # Methodology matches the reference baseline (BASELINE.md: "each query
    # run 3×, mean reported" against a warmed database).  One untimed
    # warmup execution per query first: Janino whole-stage-codegen compile
    # is a per-JVM one-time cost (~2s on the widest aggregates) that a
    # long-lived cluster never pays per query; without it the first timed
    # run measures the compiler, not the engine.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    times: dict[str, float] = {}
    for name in names:
        for _ in range(warmup):
            qs[name].build(spark, SF_DIR).collect()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            # collect() (not count()) so Catalyst can't prune away the
            # actual aggregate work; headline results are all small.
            _ = qs[name].build(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sum(samples) / len(samples), 4)

    out = {
        "metric": "tpch_total",
        # the headline metric stays the TPC-H battery total (comparable
        # to BASELINE.md and across rounds); beyond-reference extras are
        # reported per-query but not folded into the total
        "value": round(sum(v for k, v in times.items() if k.startswith("tpch_")), 4),
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
