"""Unit-level checks of the similarity/dedup operators beyond the oracle
harness: fast-vs-exact cosine agreement, LSH recall vs brute force,
simhash hamming locality sanity."""

import pytest
from pyspark.sql import functions as F

from qwatch_spark.operators.dedup_text import (
    jaccard_pairs,
    lsh_candidate_pairs,
)
from qwatch_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    cosine_topk_fast,
    lsh_sign_buckets,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_fast_cosine_matches_exact(emb):
    exact = {r["vec_id"]: r["cosine"] for r in cosine_topk(emb, 0, k=10).collect()}
    fast = {r["vec_id"]: r["cosine"] for r in cosine_topk_fast(emb, 0, k=10).collect()}
    assert set(exact) == set(fast)
    for vid in exact:
        assert abs(exact[vid] - fast[vid]) < 1e-8


def test_ann_is_subset_of_bruteforce_ranking(emb):
    """Every ANN hit must carry the same cosine the exact scorer assigns."""
    ann = {r["vec_id"]: r["cosine"] for r in ann_topk_lsh(emb, 0, k=5).collect()}
    assert ann  # query's bucket is non-trivial
    full = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk(emb, 0, k=10**6).collect()
    }
    for vid, cos in ann.items():
        assert full[vid] == cos


def test_lsh_buckets_partition_all_vectors(emb):
    n = emb.count()
    b = lsh_sign_buckets(emb)
    assert b.count() == n
    assert b.select("bucket").distinct().count() > 1


def test_lsh_candidates_have_high_jaccard_recall(docs):
    """Pairs with very high word-set Jaccard should mostly share an LSH
    band bucket (4 hashes, 2 bands → P(candidate) = 1-(1-s²)² ≈ 0.97 at
    s=0.9)."""
    strong = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(docs, threshold=0.9).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    if strong:
        recall = len(strong & cands) / len(strong)
        assert recall >= 0.8, f"LSH recall {recall} over {len(strong)} strong pairs"


def test_lsh_refine_composition(docs):
    """The scale path: LSH candidates → exact Jaccard refine must be a
    subset of the raw pairwise result at the same threshold."""
    raw = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand = lsh_candidate_pairs(docs)
    refined = jaccard_pairs(docs, threshold=0.5).join(
        cand, ["doc_a", "doc_b"], "left_semi"
    )
    for r in refined.collect():
        assert raw[(r["doc_a"], r["doc_b"])] == r["jaccard"]
