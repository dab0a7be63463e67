"""Precision/recall properties of the probabilistic dedup & ANN operators
(their queries() entries are rows-only; these tests pin semantics)."""

from __future__ import annotations

import pytest

from gfs_to_prometheus_spark.operators import dedup, similarity
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_minhash_lsh_subset_of_exact_with_recall(spark, docs):
    """Verified LSH pairs must be a subset of the exact-Jaccard pairs
    (precision 1.0); banding with k=32,b=8 should catch most of them."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(docs, threshold=0.05).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            docs, k=32, bands=8, threshold=0.05
        ).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.5  # recall floor at this low threshold


def test_minhash_high_jaccard_recall_is_total(spark):
    """Near-identical docs (J >= 0.8) must always be caught by 8 bands of 4."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [(0, base), (1, base + "lambda"), (2, "totally different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(df, threshold=0.8).collect()
    }
    assert (0, 1) in got
    assert all(2 not in p for p in got)


def test_simhash_close_docs_close_hashes(spark):
    base = "one two three four five six seven eight nine ten " * 10
    rows = [(0, base), (1, base + " eleven"), (2, "x y z " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    ham01 = bin(h[0] ^ h[1]).count("1")
    ham02 = bin(h[0] ^ h[2]).count("1")
    assert ham01 < ham02


def test_ann_lsh_subset_quality(spark, emb):
    """Multi-probe LSH top-k: every hit must appear in the exact top-50 and
    the exact top-1 must be found (smoke-level recall on 500 vectors)."""
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, 0, k=50).collect()]
    approx = [r["vec_id"] for r in similarity.ann_lsh_topk(emb, 0, k=10).collect()]
    assert len(approx) == 10
    overlap = len(set(approx) & set(exact))
    assert overlap >= 5  # bucketed candidates still surface mostly-true tops


def test_ivf_recall(spark, emb):
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, 0, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.ivf_topk(emb, 0, k=10).collect()]
    assert len(approx) == 10
    # probing 4/16 lists must still recover a majority of the true top-10
    assert len(set(approx) & set(exact)) >= 5
    # determinism
    again = [r["vec_id"] for r in similarity.ivf_topk(emb, 0, k=10).collect()]
    assert approx == again
