"""Randomized differential testing: hypothesis-generated corpora and
queries, every serving path vs the NumPy oracle.

Corpora are drawn to stress the structures the fixed fixtures can't:
tiny/empty docs, single-doc corpora, a term present in EVERY doc
(minimal idf), heavy duplication, unicode tokens — and the index is
built with tiny blocks (block_size=4) and a tiny shard span so block
and shard boundaries land mid-posting-list constantly. Every failure
here is a real serving bug, not a flake: the oracle recomputes BM25
from scratch in pure Python/NumPy with the documented summation order.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle
from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    search_topk,
    search_topk_batch,
)

# small, skewed vocabulary so terms collide across docs constantly;
# a unicode word exercises the tokenizer/hash path end to end
VOCAB = ["apple", "pear", "zebra", "qq", "wörld", "x1", "xx2", "deep", "rare9"]

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=24).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=32)
query_strategy = st.lists(
    st.sampled_from(VOCAB + ["absentterm"]), min_size=1, max_size=4
).map(" ".join)


@pytest.fixture(scope="module")
def fuzz_tmp(tmp_path_factory):
    return tmp_path_factory.mktemp("fuzz")


_COUNTER = [0]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy, queries=st.lists(query_strategy, min_size=1, max_size=5))
def test_all_serving_paths_match_oracle(spark, fuzz_tmp, corpus, queries):
    _COUNTER[0] += 1
    out = str(fuzz_tmp / f"ix{_COUNTER[0]}")
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    # tiny blocks + tiny shards: boundaries land mid-list constantly
    build_index(spark, docs, out, shard_span=8, n_buckets=4, block_size=4)
    idx = Index.load(spark, out)
    oracle = BM25Oracle(list(enumerate(corpus)))

    for q in queries:
        want = oracle.search(q, k=10)
        for algorithm in ("wand", "dense"):
            for serving in ("driver", "spark"):
                got = [
                    (r["doc_id"], r["score"])
                    for r in search_topk(
                        idx, q, k=10, algorithm=algorithm, serving=serving
                    ).collect()
                ]
                assert len(got) == len(want), (q, algorithm, serving, corpus)
                for (gd, gs), (wd, ws) in zip(got, want):
                    assert gd == wd, (q, algorithm, serving, corpus)
                    assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12), (
                        q, algorithm, serving, corpus
                    )
        # conjunctive: the four serving paths must agree with each other
        and_results = [
            [
                (r["doc_id"], r["score"])
                for r in search_topk(
                    idx, q, k=10, mode="and", algorithm=a, serving=s
                ).collect()
            ]
            for a in ("wand", "dense")
            for s in ("driver", "spark")
        ]
        assert all(r == and_results[0] for r in and_results[1:]), (q, corpus)
    # the batch path serves the same queries in one pass, bit-identical
    qs = {f"q{i}": q for i, q in enumerate(queries)}
    by_q: dict[str, list] = {}
    for r in search_topk_batch(idx, qs, k=10, serving="spark").collect():
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in qs.items():
        want = [
            (r["doc_id"], r["score"])
            for r in search_topk(idx, q, k=10, serving="spark").collect()
        ]
        assert by_q.get(qid, []) == want, (q, corpus)


def test_all_empty_corpus_index_serves_empty(spark, tmp_path):
    """Regression for the fuzzer's find: a corpus whose every document
    tokenizes to nothing builds a valid zero-posting index (zero-row
    partitioned writes leave only _SUCCESS) and every serving path
    answers empty instead of dying on parquet schema inference."""
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "!!??")], "doc_id long, text string"
    )
    out = str(tmp_path / "emptyidx")
    build_index(spark, docs, out, n_buckets=4)
    idx = Index.load(spark, out)
    assert idx.stats.n_docs == 0
    assert search_topk(idx, "anything", k=5).count() == 0
    assert search_topk(idx, "anything", k=5, serving="spark").count() == 0
    assert search_topk_batch(idx, {"a": "anything", "b": ""}, k=5).count() == 0
    assert idx.report()["postings"] == 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy, queries=st.lists(query_strategy, min_size=1, max_size=3))
def test_pagination_walk_matches_oracle_full_ranking(spark, fuzz_tmp, corpus, queries):
    """Cursor-paged walks reconstruct the oracle's FULL ranking on
    randomized corpora with mid-list block/shard boundaries, on both
    algorithms — and a cursor drawn mid-tie-group resumes exactly."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk_rows

    _COUNTER[0] += 1
    out = str(fuzz_tmp / f"pg{_COUNTER[0]}")
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    build_index(spark, docs, out, shard_span=8, n_buckets=4, block_size=4)
    idx = Index.load(spark, out)
    oracle = BM25Oracle(list(enumerate(corpus)))

    for q in queries:
        want = oracle.search(q, k=10_000)
        for algorithm in ("wand", "dense"):
            got, after = [], None
            for _page in range(len(want) + 2):
                rows = search_topk_rows(idx, q, k=3, algorithm=algorithm,
                                        after=after)
                if not rows:
                    break
                got.extend(rows)
                after = rows[-1]
            assert len(got) == len(want), (q, algorithm, corpus)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert gd == wd and math.isclose(gs, ws, rel_tol=1e-12,
                                                 abs_tol=1e-12), (
                    q, algorithm, corpus
                )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=corpus_strategy,
    prefix=st.sampled_from(["a", "x", "q", "w", "z", "pe", "xx", "nope"]),
)
def test_wildcard_matches_expanded_or_oracle(spark, fuzz_tmp, corpus, prefix):
    """wildcard '<prefix>*' == oracle BM25 over the df-ranked capped
    expansion, on randomized corpora."""
    from collections import Counter

    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.query_exec import wildcard_search

    _COUNTER[0] += 1
    out = str(fuzz_tmp / f"wc{_COUNTER[0]}")
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    build_index(spark, docs, out, shard_span=8, n_buckets=4, block_size=4)
    idx = Index.load(spark, out)
    oracle = BM25Oracle(list(enumerate(corpus)))

    df = Counter()
    for _i, text in enumerate(corpus):
        for t in set(tokenize(text)):
            df[t] += 1
    exp = sorted(
        (t for t in df if t.startswith(prefix)),
        key=lambda t: (-df[t], t),
    )[:2]
    want = oracle.search(" ".join(exp), k=10) if exp else []
    got = [
        (r["doc_id"], r["score"])
        for r in wildcard_search(idx, prefix + "*", k=10,
                                 max_expansions=2).collect()
    ]
    assert len(got) == len(want), (prefix, exp, corpus)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd and math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=corpus_strategy,
    qterms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3,
                    unique=True),
    window=st.integers(min_value=1, max_value=12),
)
def test_near_search_matches_bruteforce_window(
    spark, fuzz_tmp, corpus, qterms, window
):
    """Unordered proximity vs a pure-Python sliding-window check on
    randomized corpora: the matched-doc SET must be exactly the docs
    where some width-`window` token window contains every query term,
    and scores must equal mode='and' BM25 restricted to that set."""
    from hadoop_search_engine_spark.operators.query_exec import near_search

    _COUNTER[0] += 1
    out = str(fuzz_tmp / f"nw{_COUNTER[0]}")
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    build_index(spark, docs, out, n_buckets=2, block_size=3,
                shard_span=4, positions=True)
    idx = Index.load(spark, out)
    got = {r["doc_id"]: r["score"]
           for r in near_search(idx, " ".join(qterms), window=window,
                                k=100).collect()}

    def matches(text: str) -> bool:
        toks = text.split()
        for i in range(len(toks)):
            win = set(toks[i:i + window])
            if all(t in win for t in qterms):
                return True
        return False

    want_docs = {i for i, text in enumerate(corpus) if matches(text)}
    assert set(got) == want_docs
    if want_docs:
        oracle = BM25Oracle(list(enumerate(corpus)))
        # window-matching docs contain every term, so the OR score
        # over the allowed set IS the mode="and" score
        want = dict(oracle.search(" ".join(qterms), k=100,
                                  allowed=want_docs))
        for d in want_docs:
            assert abs(got[d] - want[d]) < 1e-9
