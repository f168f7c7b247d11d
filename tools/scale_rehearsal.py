"""Scale rehearsal for the LSH/IVF flagships (round-7 VERDICT item 7).

Builds 1x/2x/5x/10x corpora from the sf0.1 fixtures — documents are
replicated with per-copy word SALTING (every token suffixed with the
copy id), so each copy keeps the original's intra-copy near-dup
structure while sharing no shingles across copies: the ground-truth
dup structure grows LINEARLY with the corpus, which is exactly the
regime the Σb² / Σcell² cost models predict linear candidate growth
for.  Embeddings replicate with deterministic per-copy jitter (same
distribution, no exact clones).

Measured per scale:
* minhash-LSH: distinct band-key candidate pairs + wall time of the
  candidate join — model: Σ_buckets |b|² stays ∝ n when bucket sizes
  are scale-invariant.
* semantic IVF (SemDeDup): Σ|cell|² pair-space bound with nlist
  scaled ∝ √n (the documented knob), vs the n² it replaces.
* IVF probe: rows touched by an nprobe=4 probe vs corpus rows.

Usage: python tools/scale_rehearsal.py  (appends nothing; prints a
markdown table to paste into SCALING.md).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stonedb_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = (1, 2, 5, 10)


def salted_docs(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = None
    for k in range(copies):
        c = base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            # suffix every token with the copy id -> zero shared
            # shingles across copies, identical structure within
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit(f"_{k}")),
                ),
            ).alias("text"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def jittered_embeddings(spark, copies: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    out = None
    for k in range(copies):
        c = base.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(k)), 1000) - 500)
                   / 20000.0).cast("float"),
            ).alias("embedding"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def lsh_candidates(docs):
    from stonedb_spark.operators.dedup import band_keys, minhash_signatures

    bk = band_keys(minhash_signatures(docs, "text"))
    cand = (
        bk.alias("x")
        .join(bk.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    t0 = time.perf_counter()
    n = cand.count()
    return n, time.perf_counter() - t0


def ivf_cell_stats(emb, nlist: int):
    from stonedb_spark.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, nlist=nlist)
    assigned = ivf_assign(emb, cents)
    sizes = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    row = sizes.agg(
        F.sum(F.col("n") * F.col("n")).alias("pair_space"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_cell"),
    ).collect()[0]
    return int(row["pair_space"]), int(row["n_rows"]), int(row["max_cell"])


def wall_time_growth(spark, copies=(1, 2, 5)) -> None:
    """Round-10 VERDICT item 9: measured wall-time growth for the two
    >1 s non-TPCH entries — the iterative CC loop (dedup_clusters) and
    the PQ window (knn_pq_adc) — over replicated fixture dirs, so the
    near-linear claims stay measured, not asserted."""
    import shutil
    import tempfile

    from stonedb_spark.queries import all_queries

    qs = all_queries()
    print()
    print("| copies | docs | dedup_clusters sec | emb rows | "
          "knn_pq_adc sec |")
    print("|---|---|---|---|---|")
    for k in copies:
        d = tempfile.mkdtemp(prefix=f"scale{k}x_")
        docs = salted_docs(spark, k)
        docs.write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        emb = jittered_embeddings(spark, k)
        emb.write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet"))
        n_docs = spark.read.parquet(
            os.path.join(d, "documents.parquet")).count()
        n_emb = spark.read.parquet(
            os.path.join(d, "embeddings.parquet")).count()
        t0 = time.perf_counter()
        qs["dedup_clusters"].build(spark, d).count()
        cc_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        qs["knn_pq_adc"].build(spark, d).count()
        pq_sec = time.perf_counter() - t0
        print(f"| {k}x | {n_docs} | {cc_sec:.2f} | {n_emb} | "
              f"{pq_sec:.2f} |")
        shutil.rmtree(d, ignore_errors=True)


def shifted_lineitem(spark, copies: int):
    """Replicate lineitem with per-copy key shifts: l_orderkey moves by
    a multiple of 20 (preserving graph_pagerank's %20 sampling) and
    l_partkey by a disjoint block, so the co-purchase graph is `copies`
    disjoint isomorphic components — ground truth grows linearly."""
    base = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    out = None
    for k in range(copies):
        c = base.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 100_000_000)
        ).withColumn(
            "l_partkey", F.col("l_partkey") + F.lit(k * 10_000_000)
        )
        out = c if out is None else out.unionByName(c)
    return out


def wall_time_growth_r12(spark, copies=(1, 2, 5)) -> None:
    """Round-11 VERDICT item 7: measured wall-time growth for the next
    two >1 s entries — the fixed-point loop (graph_pagerank, disjoint
    replicated co-purchase graphs) and the banded candidate join
    (dedup_minhash_lsh, word-salted document copies)."""
    import shutil
    import tempfile

    from stonedb_spark.queries import all_queries

    qs = all_queries()
    print()
    print("| copies | lineitem rows | graph_pagerank sec | docs | "
          "dedup_minhash_lsh sec |")
    print("|---|---|---|---|---|")
    for k in copies:
        d = tempfile.mkdtemp(prefix=f"scale12_{k}x_")
        shifted_lineitem(spark, k).write.mode("overwrite").parquet(
            os.path.join(d, "lineitem.parquet"))
        salted_docs(spark, k).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        n_l = spark.read.parquet(
            os.path.join(d, "lineitem.parquet")).count()
        n_docs = spark.read.parquet(
            os.path.join(d, "documents.parquet")).count()
        t0 = time.perf_counter()
        qs["graph_pagerank"].build(spark, d).count()
        pr_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        qs["dedup_minhash_lsh"].build(spark, d).count()
        mh_sec = time.perf_counter() - t0
        print(f"| {k}x | {n_l} | {pr_sec:.2f} | {n_docs} | "
              f"{mh_sec:.2f} |")
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    spark = get_spark("scale-rehearsal")
    print("| copies | docs | LSH cand pairs | pairs/doc | cand sec | "
          "emb rows | nlist | Σcell² | Σcell²/n | vs n² |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for k in COPIES:
        docs = salted_docs(spark, k).persist()
        n_docs = docs.count()
        cand, sec = lsh_candidates(docs)
        emb = jittered_embeddings(spark, k).persist()
        n_emb = emb.count()
        nlist = max(16, int(math.sqrt(n_emb)))
        pair_space, n_rows, max_cell = ivf_cell_stats(emb, nlist)
        print(
            f"| {k}x | {n_docs} | {cand} | {cand / n_docs:.2f} | {sec:.2f} | "
            f"{n_emb} | {nlist} | {pair_space} | {pair_space / n_rows:.0f} | "
            f"{pair_space / (n_rows * n_rows):.5f} |"
        )
        docs.unpersist()
        emb.unpersist()
    wall_time_growth(spark)
    spark.stop()


if __name__ == "__main__":
    main()
