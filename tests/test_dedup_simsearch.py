"""Dedup + similarity-search operators on crafted corpora."""

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_candidates,
)
from kgcompass_spark.operators.simsearch import brute_force_topk, ivf_topk, lsh_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    other = "completely different content about spark shuffle partitions and joins"
    rows = [(0, base), (1, base), (2, near), (3, other)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = exact_duplicates(docs).filter(F.col("dup_count") > 1).collect()
    assert len(out) == 1
    assert out[0]["dup_ids"] == [0, 1]
    assert out[0]["keeper_id"] == 0


def test_minhash_lsh_finds_near_dups(docs):
    sigs = minhash_signatures(docs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(sigs).collect()}
    assert (0, 1) in pairs          # identical docs share all bands
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup shares some band
    assert (0, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_scores(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard(docs, pairs).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(0, 3)] == 0.0


def test_simhash_near_dup_hamming(docs):
    sigs = simhash(docs)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_candidates(sigs).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs.get((0, 2), 99) <= 12   # near-dup: small hamming distance


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.2, 0.0]),   # near 2
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vectors):
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<float>")
    out = brute_force_topk(vectors, q, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [0, 1]
    assert out[0]["cosine"] == pytest.approx(1.0)


def test_lsh_topk_recovers_neighbor(spark, vectors):
    q = spark.createDataFrame([(0, [0.0, 1.0, 0.0, 0.0])], "query_id long, query_vec array<float>")
    out = lsh_topk(vectors, q, k=2, n_planes=4).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 2


def test_ivf_topk_recovers_neighbor(spark, vectors):
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<float>")
    out = ivf_topk(vectors, q, k=2, n_cells=2, n_probe=2).orderBy("rank").collect()
    assert out and out[0]["vec_id"] == 0


def test_embedding_near_duplicates(spark, vectors):
    out = {
        (r["vec_a"], r["vec_b"]) for r in embedding_near_duplicates(vectors, threshold=0.95).collect()
    }
    assert (0, 1) in out
    assert all(p in {(0, 1), (2, 3)} for p in out)
