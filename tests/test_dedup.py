import pandas as pd
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different content about spark inverted index engines at scale"


def test_exact_dedup(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER), (4, BASE)])
    kept = dedup.exact_dedup(docs).collect()
    assert sorted((r["doc_id"], r["dup_count"]) for r in kept) == [(1, 3), (3, 1)]
    pairs = dedup.exact_dup_pairs(docs).collect()
    assert sorted((r["keep_id"], r["dup_id"]) for r in pairs) == [(1, 2), (1, 4)]


def test_ngram_jaccard(spark):
    docs = _docs(spark, [(1, BASE), (2, NEAR), (3, OTHER)])
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]
    j = pairs[0]["jaccard"]
    assert 0.5 <= j < 1.0


def test_ngram_jaccard_identical_docs(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE)])
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.99).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark, [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)])
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=64, bands=16, threshold=0.5)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 4) in got  # identical docs always collide
    assert (1, 2) in got  # near dups
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_deterministic_across_runs(spark):
    docs = _docs(spark, [(i, f"{BASE} variant {i % 3}") for i in range(12)])
    a = dedup.minhash_signatures(docs).orderBy("doc_id").collect()
    b = dedup.minhash_signatures(docs.repartition(5)).orderBy("doc_id").collect()
    assert [r["sig"] for r in a] == [r["sig"] for r in b]


def test_simhash_near_dups(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_simhash_pigeonhole_candidates(spark):
    # hamming <= 3 across 4 chunks of 16 bits guarantees a shared chunk
    docs = _docs(spark, [(1, NEAR), (2, NEAR + " x")])
    got = dedup.simhash_near_dup_pairs(docs, max_hamming=10).collect()
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    ham = bin(sigs[1] ^ sigs[2]).count("1")
    if ham <= 3:  # then banding MUST find it
        assert len(got) == 1
