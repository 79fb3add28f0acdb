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


def test_ensure_parallelism_guard_contract(spark):
    """The shingle-stage repartition guard fires ONLY on under-partitioned
    input (the single-row-group parquet case) and is an identity — no added
    exchange — once partitions reach default parallelism."""
    from kgcompass_spark.operators import dedup

    target = spark.sparkContext.defaultParallelism
    well = spark.range(1000).repartition(target)
    assert dedup._ensure_parallelism(well) is well
    narrow = spark.range(1000).coalesce(1)
    out = dedup._ensure_parallelism(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target


def test_contamination_check_flags_verbatim_ngrams(spark):
    from kgcompass_spark.operators.dedup import contamination_check

    bench_text = "what is the capital of france the answer is paris exactly"
    train = spark.createDataFrame(
        [
            # contains the benchmark question verbatim inside other prose
            (10, "intro text what is the capital of france the answer is paris exactly trailing words"),
            # paraphrase: no verbatim 8-gram survives
            (11, "the capital city of france is named paris as everyone knows"),
            (12, "unrelated document about spark shuffle partitions and joins"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, bench_text)], "bench_id long, text string")
    out = {r["doc_id"]: r["n_hits"] for r in contamination_check(train, bench).collect()}
    # doc 10 contains all 4 sliding 8-grams of the 11-token benchmark text
    assert out == {10: 4}


def test_contamination_check_short_text_whole_gram(spark):
    from kgcompass_spark.operators.dedup import contamination_check

    # benchmark shorter than n tokens → its whole text is the single gram;
    # only the doc sharing an identical full window (here: the exact short
    # string as its own whole-text gram) matches
    bench = spark.createDataFrame([(0, "exact short answer")], "bench_id long, text string")
    train = spark.createDataFrame(
        [(1, "exact short answer"), (2, "prefix exact short answer suffix")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_hits"] for r in contamination_check(train, bench).collect()}
    # doc 1 (also < n tokens) degenerates to the same whole-text gram;
    # doc 2 (5 tokens) degenerates to ITS whole text, which differs
    assert out == {1: 1}


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


def test_minhash_mega_bucket_guard(spark):
    # 400 identical boilerplate docs + 2 distinct: the boilerplate bucket
    # exceeds max_bucket_size=64, so it emits a star to the min doc_id
    # (B-1 pairs), not the B*(B-1)/2 clique — connectivity preserved,
    # enumeration capped.
    rows = [(i, "boilerplate footer text repeated on every page verbatim")
            for i in range(400)]
    rows += [(1000, "unique content one about spark"),
             (1001, "unique content two about ducks")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    pairs = minhash_lsh_candidates(sigs, max_bucket_size=64).collect()
    boiler = [r for r in pairs if r["doc_a"] == 0]
    assert len(boiler) == 399                      # star, not clique
    assert len(pairs) == 399                       # no non-keeper pairs
    assert all(r["n_shared_bands"] == 8 for r in boiler)


def test_minhash_guard_no_effect_on_small_buckets(docs):
    sigs = minhash_signatures(docs)
    base = {(r["doc_a"], r["doc_b"], r["n_shared_bands"])
            for r in minhash_lsh_candidates(sigs).collect()}
    guarded = {(r["doc_a"], r["doc_b"], r["n_shared_bands"])
               for r in minhash_lsh_candidates(sigs, max_bucket_size=2).collect()}
    # with threshold 2 the identical pair (0,1) bucket is exactly at the
    # boundary; raise threshold -> identical results
    big = {(r["doc_a"], r["doc_b"], r["n_shared_bands"])
           for r in minhash_lsh_candidates(sigs, max_bucket_size=256).collect()}
    assert big == base


def test_md5_family_matches_logic(spark, docs):
    # the md5_60 oracle parameterization runs the same banding logic:
    # identical docs still share all 8 bands under either hash family
    from kgcompass_spark.functions.hashing import md5_60

    sigs = minhash_signatures(docs, hash_fn=md5_60)
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"]
             for r in minhash_lsh_candidates(sigs, hash_fn=md5_60).collect()}
    assert pairs[(0, 1)] == 8
    out = simhash(docs, bits=60, hash_fn=md5_60).collect()
    by_id = {r["doc_id"]: r["simhash"] for r in out}
    assert by_id[0] == by_id[1]
    assert all(0 <= v < (1 << 60) for v in by_id.values())


def test_brute_force_pre_topk_matches_window(spark, vectors):
    # the per-partition pre-top-k prune must be exact: repartition the base
    # so multiple partitions contribute, compare against k = all
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0, 0.0])],
                              "query_id long, query_vec array<double>")
    base = vectors.repartition(4)
    got = {(r["vec_id"], r["rank"])
           for r in brute_force_topk(base, q, k=3).collect()}
    full = brute_force_topk(vectors.coalesce(1), q, k=3)
    want = {(r["vec_id"], r["rank"]) for r in full.collect()}
    assert got == want


def test_domain_cap_two_phase_equals_plain_window(spark):
    """The skew-safe two-phase selection must equal the naive per-domain
    window for every k, including a mega-domain spread over many input
    partitions."""
    from pyspark.sql import Window

    from kgcompass_spark.operators.curation import domain_cap

    rows = [(i, "spam.example" if i < 900 else f"site{i % 7}.example", (i * 37) % 101)
            for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).repartition(16)
    key = F.struct((-F.col("n_chars")).alias("q"), F.col("doc_id").alias("id"))
    for k in (1, 3, 20):
        got = {r["doc_id"] for r in domain_cap(docs, k, key).collect()}
        w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        want = {
            r["doc_id"]
            for r in docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .collect()
        }
        assert got == want, k
        # cap actually binds on the mega-domain
        assert sum(1 for d in got if d < 900) == k


def test_hash_sample_deterministic_and_partition_invariant(spark):
    from kgcompass_spark.operators.curation import hash_sample

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="s1").collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(13), 0.2, salt="s1").collect()}
    c = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="s2").collect()}
    assert a == b                      # layout never changes the draw
    assert a != c                      # the salt does
    assert 0.15 < len(a) / 2000 < 0.25
