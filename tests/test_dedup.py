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


def test_simhash_banding_complete_vs_bruteforce(spark):
    """Banded candidate generation must find EVERY pair within
    max_hamming — compared unconditionally against a brute-force
    Hamming join over all signature pairs."""
    import itertools

    base_words = BASE.split()
    rows = []
    for i in range(120):
        words = list(base_words)
        words[i % len(words)] = f"w{i % 11}"
        if i % 3 == 0:
            words.append(f"extra{i % 7}")
        rows.append((i, " ".join(words)))
    docs = _docs(spark, rows)
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")

    all_hams = [ham(a, b) for a, b in itertools.combinations(sorted(sigs), 2)]
    for mh in (3, 8):
        # the fixture must actually exercise the bound's edge
        assert any(0 < h <= mh for h in all_hams)
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if ham(a, b) <= mh
        }
        got = {
            (r["a"], r["b"])
            for r in dedup.simhash_near_dup_pairs(docs, max_hamming=mh).collect()
        }
        assert got == want


def test_ngram_jaccard_max_shingle_df_cap(spark):
    """Head-shingle df cap: the planted near-dup pair survives, pairs
    whose only overlap was the capped head shingle are dropped."""
    common = "alpha beta gamma"
    rows = [(i, f"{common} filler{i} filler{i} end{i}") for i in range(10)]
    rows += [(100, BASE), (101, NEAR)]
    docs = _docs(spark, rows)
    capped = dedup.ngram_jaccard_pairs(
        docs, n=3, threshold=0.01, max_shingle_df=5
    ).collect()
    got = {(r["a"], r["b"]) for r in capped}
    assert (100, 101) in got
    assert not any(a < 10 and b < 10 for a, b in got)
    # without the cap the head shingle links every filler-doc pair
    uncapped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.01).collect()
    got_uncapped = {(r["a"], r["b"]) for r in uncapped}
    assert any(a < 10 and b < 10 for a, b in got_uncapped)


def test_simhash_exact_duplicates_max_hamming_zero(spark):
    """max_hamming=0 (single 64-bit chunk) must work — exact-duplicate
    simhash matching, previously broken by a long-overflow mask."""
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)])
    got = {(r["a"], r["b"], r["hamming"])
           for r in dedup.simhash_near_dup_pairs(docs, max_hamming=0).collect()}
    assert (1, 2, 0) in got
    assert all(h == 0 for _, _, h in got)


# -- dup_clusters (connected components) --------------------------------------

def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def _cc_reference(pair_rows, nodes=None):
    """Brute-force union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in set(parent) | set(nodes or []):
        out[n] = find(n)
    return out


def test_dup_clusters_transitive_chain(spark):
    # A~B, B~C, C~D: one component even though A,D never pair directly
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_and_random_graph(spark):
    import random

    rng = random.Random(7)
    # 60-node path (worst case for naive min-propagation) + random extra edges
    rows = [(i, i + 1) for i in range(100, 160)]
    rows += [(rng.randrange(0, 80), rng.randrange(0, 80)) for _ in range(60)]
    rows = [(a, b) for a, b in rows if a != b]
    want = _cc_reference(rows)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(_pairs(spark, rows)).collect()
    }
    assert got == want


def test_dup_clusters_singletons_and_direction_invariance(spark):
    pairs = _pairs(spark, [(5, 2), (9, 5)])  # unordered input pairs
    ids = spark.createDataFrame([(2,), (5,), (7,), (9,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs, all_ids=ids).collect()
    }
    assert got == {2: 2, 5: 2, 9: 2, 7: 7}


def test_dup_clusters_from_jaccard_pairs(spark):
    docs = _docs(spark, [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)])
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs, all_ids=docs.select("doc_id")).collect()
    }
    assert got == {1: 1, 2: 1, 4: 1, 3: 3}
