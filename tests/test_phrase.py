"""Positional index + exact-phrase search vs the NumPy oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    phrase_search,
    search_topk,
)
from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown dog sleeps while the brown fox runs"),
    (2, "a brown fox and a quick dog and a quick brown fox"),
    (3, "completely unrelated content about spark engines"),
    (4, "brown quick fox"),                       # words present, wrong order
    (5, "the the the repeated words the the"),    # duplicate-term phrases
    (6, "quick brown"),                           # phrase at doc boundary
]


@pytest.fixture(scope="module")
def phrase_setup(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("pidx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=4, positions=True)
    return Index.load(spark, out), BM25Oracle(ROWS)


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _check(got, want, q):
    assert len(got) == len(want), f"{q}: {got} vs {want}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd, f"{q}: {got} vs {want}"
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12), q


PHRASES = [
    "quick brown fox",     # docs 0 (q b f? doc0: quick brown fox yes), 2
    "brown fox",           # 0, 1, 2, (not 4)
    "the lazy dog",        # 0
    "quick brown",         # 0, 2, 6 (not 1: quick brown dog -> yes 1 too)
    "the the",             # 5 (duplicate-term adjacency)
    "fox jumps over",      # 0
    "lazy fox",            # nothing (both present in 0 but not adjacent)
    "zzz brown",           # absent term
    "",                    # empty
]


@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_phrase_matches_oracle(phrase_setup, serving):
    idx, oracle = phrase_setup
    for q in PHRASES:
        got = _pairs(phrase_search(idx, q, k=10, serving=serving))
        want = oracle.phrase_search(q, k=10)
        _check(got, want, f"{serving}:{q!r}")


PROX = [
    ("quick fox", 0),    # not adjacent anywhere except... doc4? "brown quick fox": quick->fox gap 0? positions: brown0 quick1 fox2 -> adjacent! doc4 matches even exact
    ("quick fox", 1),    # doc0 "quick brown fox" gap 1; doc2 both
    ("quick fox", 2),
    ("the dog", 2),      # doc0 "the lazy dog" gap 1
    ("quick dog", 3),
    ("fox dog", 8),      # wide window
    ("dog fox", 1),      # order still enforced
    ("the the", 1),
    ("quick brown fox", 1),
]


@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_proximity_matches_oracle(phrase_setup, serving):
    idx, oracle = phrase_setup
    for q, slop in PROX:
        got = _pairs(phrase_search(idx, q, k=10, serving=serving, slop=slop))
        want = oracle.phrase_search(q, k=10, slop=slop)
        _check(got, want, f"{serving}:{q!r}~{slop}")


def test_proximity_widens_monotonically(phrase_setup):
    """slop=0 == exact phrase; match sets grow with slop and stay
    within mode='and'."""
    idx, _ = phrase_setup
    exact = {d for d, _ in _pairs(phrase_search(idx, "quick fox", k=10))}
    s0 = {d for d, _ in _pairs(phrase_search(idx, "quick fox", k=10, slop=0))}
    assert s0 == exact
    prev = s0
    for slop in (1, 2, 4, 8):
        cur = {d for d, _ in _pairs(
            phrase_search(idx, "quick fox", k=10, slop=slop)
        )}
        assert prev <= cur
        prev = cur
    conj = {d for d, _ in _pairs(
        search_topk(idx, "quick fox", k=10, mode="and")
    )}
    assert prev <= conj


def test_proximity_slop_validation(phrase_setup):
    idx, _ = phrase_setup
    with pytest.raises(ValueError, match="slop"):
        phrase_search(idx, "quick fox", slop=-1)
    with pytest.raises(ValueError, match="slop"):
        phrase_search(idx, "quick fox", slop=1 << 20)


def test_phrase_is_subset_of_and_mode(phrase_setup):
    idx, _ = phrase_setup
    ph = {d for d, _ in _pairs(phrase_search(idx, "brown fox", k=10))}
    conj = {d for d, _ in _pairs(search_topk(idx, "brown fox", k=10, mode="and"))}
    assert ph <= conj
    assert 4 in conj and 4 not in ph  # wrong order: AND hits, phrase doesn't


def test_phrase_requires_positional_index(spark, tiny_index):
    with pytest.raises(ValueError, match="positions=True"):
        phrase_search(tiny_index, "w00000 w00001")


def test_non_positional_default_unchanged(phrase_setup, spark, tmp_path):
    """positions=False build has a null positions column and identical
    search results for the same corpus."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path / "noposidx")
    build_index(spark, docs, out, n_buckets=4, block_size=4)
    idx = Index.load(spark, out)
    assert idx.stats.positions is False
    assert idx.postings.where(F.col("positions").isNotNull()).count() == 0
    pidx, oracle = phrase_setup
    for q in ["quick brown fox", "the lazy dog"]:
        a = _pairs(search_topk(idx, q, k=10))
        b = _pairs(search_topk(pidx, q, k=10))
        assert a == b


def test_positional_resume_after_injected_failure(spark, tmp_path):
    """Kill/resume with positions=True: the positional encoder path
    commits and resumes identically to the default path."""
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path / "pidx_resume")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, docs, out, n_buckets=8, block_size=4,
                    positions=True, n_waves=4, fail_after_waves=2)
    build_index(spark, docs, out, n_buckets=8, block_size=4,
                positions=True, n_waves=4, resume=True)
    idx = Index.load(spark, out)
    oracle = BM25Oracle(ROWS)
    got = _pairs(phrase_search(idx, "quick brown fox", k=10))
    _check(got, oracle.phrase_search("quick brown fox", k=10), "resume-phrase")


def test_adversarial_skew_term_in_every_doc(spark, tmp_path):
    """A term with df == N and high tf (the worst Zipf head) must
    build into bounded per-(term, shard) runs and score identically."""
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

    rows = [
        (i, ("omni " * 5) + f"w{i % 7} filler{i}") for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    oracle = BM25Oracle(rows)
    out = str(tmp_path / "skewidx")
    build_index(spark, docs, out, num_shards=4, n_buckets=4, block_size=16)
    idx = Index.load(spark, out)
    # the head term's blocks are bounded by block_size and spread shards
    h = idx.lexicon.where(F.col("term") == "omni").first()
    assert h["df"] == 400
    blocks = idx.postings.where(F.col("term_hash") == h["term_hash"]).collect()
    assert {r["shard"] for r in blocks} == {0, 1, 2, 3}
    assert all(r["n_docs"] <= 16 for r in blocks)
    for q in ["omni", "omni w3", "w5 omni filler9"]:
        got = _pairs(search_topk(idx, q, k=10))
        want = oracle.search(q, k=10)
        _check(got, want, f"skew:{q}")


def test_positions_from_events(spark, tmp_path):
    """Positional EVENT builds (the streaming-compaction shape) are
    supported when events carry pos; tf-only events still refuse
    rather than silently emit an unusable positional index."""
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        phrase_search,
    )

    ev_tf = spark.createDataFrame(
        [(0, 2, "a"), (0, 2, "b")], "doc_id long, doc_len long, term string"
    )
    with pytest.raises(ValueError, match="pos"):
        build_index(spark, ev_tf, str(tmp_path / "x"), docs_are_events=True,
                    positions=True)

    # occurrence events WITH positions: "alpha beta" adjacent in doc 0,
    # reversed in doc 1 — phrase hits exactly doc 0
    ev_pos = spark.createDataFrame(
        [
            (0, 2, "alpha", 0), (0, 2, "beta", 1),
            (1, 2, "beta", 0), (1, 2, "alpha", 1),
        ],
        "doc_id long, doc_len long, term string, pos int",
    )
    out = str(tmp_path / "evpos")
    build_index(spark, ev_pos, out, docs_are_events=True, positions=True,
                n_buckets=2, block_size=16)
    idx = Index.load(spark, out)
    assert [r["doc_id"] for r in phrase_search(idx, "alpha beta", k=5).collect()] == [0]
    assert [r["doc_id"] for r in phrase_search(idx, "beta alpha", k=5).collect()] == [1]


def test_near_search_unordered_window_semantics(phrase_setup):
    from hadoop_search_engine_spark.operators.query_exec import near_search

    ix, _oracle = phrase_setup
    # doc 4 is "brown quick fox": phrase "quick brown" misses it,
    # unordered window 2 must hit it (and every adjacent pair doc)
    ph = {d for d, _s in _pairs(phrase_search(ix, "quick brown", k=10))}
    ne = {d for d, _s in _pairs(near_search(ix, "quick brown", window=2,
                                            k=10))}
    assert 4 not in ph and 4 in ne
    assert ph <= ne  # ordered-adjacent is a subset of window-2

    # a huge window degenerates to mode="and" (same docs, same scores)
    and_res = _pairs(search_topk(ix, "quick brown", k=10, mode="and"))
    win_res = _pairs(near_search(ix, "quick brown", window=1000, k=10))
    assert win_res == and_res

    # window 1: both terms at the same position is impossible
    assert _pairs(near_search(ix, "quick brown", window=1, k=10)) == []

    # single term: every occurrence is its own window
    one = _pairs(near_search(ix, "fox", window=1, k=10))
    assert {d for d, _ in one} == {0, 1, 2, 4}


def test_near_search_window_boundary_and_servings(phrase_setup):
    from hadoop_search_engine_spark.operators.query_exec import near_search

    ix, _oracle = phrase_setup
    # doc 0: "the quick brown fox jumps over the lazy dog"
    # quick(pos1) .. dog(pos8): needs window >= 8
    hit7 = {d for d, _ in _pairs(near_search(ix, "dog quick", window=7,
                                             k=10))}
    hit8 = {d for d, _ in _pairs(near_search(ix, "dog quick", window=8,
                                             k=10))}
    assert 0 not in hit7 and 0 in hit8
    # doc 1 has quick(pos0) dog(pos2): window 3 suffices there
    assert 1 in {d for d, _ in _pairs(near_search(ix, "dog quick",
                                                  window=3, k=10))}

    # driver and spark serving identical
    a = _pairs(near_search(ix, "quick dog", window=4, k=10,
                           serving="driver"))
    b = _pairs(near_search(ix, "quick dog", window=4, k=10,
                           serving="spark"))
    assert a == b

    import pytest as _pytest
    with _pytest.raises(ValueError, match="window"):
        near_search(ix, "quick dog", window=0)
    # absent term -> empty (AND semantics)
    assert _pairs(near_search(ix, "quick zebra", window=5, k=10)) == []


# --------------------------------------------------------- span_first


def test_span_first_single_term(phrase_setup):
    """span_first(term, end=N): docs where the term occurs within the
    first N tokens; scores equal the unconstrained phrase/term search
    for surviving docs (the constraint changes eligibility, never the
    score)."""
    from hadoop_search_engine_spark.functions.tokenizer import tokenize

    idx, _oracle = phrase_setup
    for term, end in [("brown", 2), ("fox", 3), ("the", 1), ("dog", 3)]:
        got = _pairs(phrase_search(idx, term, k=10, first_end=end))
        want_docs = {
            d for d, t in ROWS if any(
                p < end for p, tok in enumerate(tokenize(t)) if tok == term
            )
        }
        assert {d for d, _s in got} == want_docs, (term, end)
        base = {d: s for d, s in
                _pairs(phrase_search(idx, term, k=10))}
        for d, s in got:
            assert math.isclose(s, base[d], rel_tol=1e-12), (term, end)


def test_span_first_phrase_end_is_last_token(phrase_setup):
    """For a 2-token phrase the span END (last token pos + 1) must fit:
    'quick brown' sits at pos 0-1 in docs 1 and 6 -> end 2; doc 0 at
    pos 1-2 -> end 3; doc 2 only at pos 9-10 (excluded)."""
    idx, _oracle = phrase_setup
    got2 = {d for d, _s in
            _pairs(phrase_search(idx, "quick brown", k=10, first_end=2))}
    assert got2 == {1, 6}
    got3 = {d for d, _s in
            _pairs(phrase_search(idx, "quick brown", k=10, first_end=3))}
    assert got3 == {0, 1, 6}


def test_span_first_validates(phrase_setup):
    idx, _oracle = phrase_setup
    with pytest.raises(ValueError, match="first_end"):
        phrase_search(idx, "brown", first_end=0)
    with pytest.raises(ValueError, match="span_first"):
        phrase_search(idx, "brown fox", first_end=3, _window=4)


def test_dsl_span_first(phrase_setup, tiny_corpus):
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    idx, _oracle = phrase_setup
    got = search_dsl(
        idx,
        {"query": {"span_first": {
            "match": {"span_term": {"text": "brown"}}, "end": 2}},
         "size": 10},
    )
    want = phrase_search(idx, "brown", k=10, first_end=2)
    assert _pairs(got.hits) == _pairs(want)

def test_simple_query_string_phrase_and_errors(phrase_setup):
    from hadoop_search_engine_spark.operators.dsl import (
        DslError,
        search_dsl,
    )

    idx, _oracle = phrase_setup
    got = search_dsl(idx, {"query": {"simple_query_string": {
        "query": '"quick brown"~1'}}, "size": 10})
    want = phrase_search(idx, "quick brown", k=10, slop=1)
    assert _pairs(got.hits) == _pairs(want)
    with pytest.raises(DslError, match="subset"):
        search_dsl(idx, {"query": {"simple_query_string": {
            "query": "a | b"}}})
    with pytest.raises(DslError, match="positive token"):
        search_dsl(idx, {"query": {"simple_query_string": {
            "query": "-a -b"}}})
