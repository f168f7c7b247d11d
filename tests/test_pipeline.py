"""Training-data pipeline operators vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from stonedb_spark.queries import all_queries
from stonedb_spark.testing import check_query

NAMES = sorted(
    n
    for n in all_queries()
    if n.split("_")[0] in ("dedup", "knn", "text", "multimodal", "events")
)


@pytest.mark.parametrize("name", NAMES)
def test_pipeline_matches_oracle(spark, oracle, sf_dir, name):
    q = all_queries()[name]
    problems = check_query(spark, oracle, q, sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", NAMES)
def test_pipeline_nonempty(spark, sf_dir, name):
    q = all_queries()[name]
    assert q.build(spark, sf_dir).count() > 0, f"{name} returned no rows"


def test_minhash_lsh_recall_vs_groundtruth(spark, sf_dir):
    """LSH candidates must recover most true near-dup pairs (b=4, r=3 →
    ~94% per-pair catch probability at J=0.8)."""
    qs = all_queries()
    truth = qs["dedup_ngram_jaccard"].build(spark, sf_dir).count()
    lsh = qs["dedup_minhash_lsh"].build(spark, sf_dir).count()
    assert truth > 0
    assert lsh >= 0.7 * truth, f"LSH recall too low: {lsh}/{truth}"
