from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.tokenizer import tokens_col
from hadoop_search_engine_spark.operators.query_exec import (
    matched_docs,
    search_topk,
)

QUERY = "w00000 w00010 w00200"
TERMS = QUERY.split()


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _docs_with_at_least(corpus, m):
    toks = corpus.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    cnt = sum(
        F.array_contains("toks", t).cast("int") for t in TERMS
    )
    return {r["doc_id"] for r in toks.where(cnt >= m).collect()}


def test_msm_one_equals_plain_or(tiny_index):
    base = _pairs(search_topk(tiny_index, QUERY, k=50))
    msm = _pairs(search_topk(tiny_index, QUERY, k=50, min_should_match=1))
    assert msm == base


def test_msm_all_equals_and_mode(tiny_index):
    a = _pairs(search_topk(tiny_index, QUERY, k=50, mode="and"))
    m = _pairs(search_topk(tiny_index, QUERY, k=50, min_should_match=3))
    assert m == a
    assert len(m) > 0


def test_msm_two_matches_exhaustive_count(tiny_corpus, tiny_index):
    want = _docs_with_at_least(tiny_corpus, 2)
    got = {
        r["doc_id"]
        for r in matched_docs(tiny_index, QUERY, min_match=2).collect()
    }
    assert got == want
    # and the scored path returns exactly those docs (k big enough),
    # each with its full disjunctive BM25 score
    full_or = dict(_pairs(search_topk(tiny_index, QUERY, k=10_000)))
    scored = dict(
        _pairs(search_topk(tiny_index, QUERY, k=10_000, min_should_match=2))
    )
    assert set(scored) == want
    for d, s in scored.items():
        assert s == full_or[d]


def test_msm_above_present_terms_is_empty(tiny_index):
    assert (
        search_topk(tiny_index, QUERY, k=10, min_should_match=4).count() == 0
    )
    # two present + one absent term: msm=3 unreachable, msm=2 works
    q = "w00000 w00010 zzznotaterm"
    assert search_topk(tiny_index, q, k=10, min_should_match=3).count() == 0
    assert search_topk(tiny_index, q, k=10, min_should_match=2).count() > 0


def test_msm_composes_with_doc_filter(tiny_corpus, tiny_index):
    keep = tiny_corpus.where(F.col("doc_id") % 2 == 0).select("doc_id")
    got = {
        r["doc_id"]
        for r in search_topk(
            tiny_index, QUERY, k=10_000, min_should_match=2, doc_filter=keep
        ).collect()
    }
    want = {d for d in _docs_with_at_least(tiny_corpus, 2) if d % 2 == 0}
    assert got == want


def test_msm_validation(tiny_index):
    with pytest.raises(ValueError):
        search_topk(tiny_index, QUERY, min_should_match=0)
    with pytest.raises(ValueError):
        search_topk(tiny_index, QUERY, mode="and", min_should_match=2)
    with pytest.raises(ValueError):
        matched_docs(tiny_index, QUERY, min_match=0)
