"""more_like_this term selection / search and explain_score breakdowns
against the NumPy oracle and search_topk's own scores."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from hadoop_search_engine_spark.functions.bm25 import idf as idf_fn
from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    explain_score,
    more_like_this,
    more_like_this_terms,
    search_topk,
    search_topk_rows,
)
from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

ROWS = [
    (0, "spark query table merge fast spark"),
    (1, "spark query vector slow table"),
    (2, "spark merge merge merge rare"),
    (3, "query table vector fast fast"),
    (4, "spark table unique words appear once"),
    (5, "merge vector spark query fast"),
    (6, "completely unrelated content here"),
    (7, "rare rare spark"),
]


@pytest.fixture(scope="module")
def mlt_setup(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("midx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=4)
    return Index.load(spark, out), BM25Oracle(ROWS), docs.persist()


def test_mlt_terms_are_top_tfidf(mlt_setup):
    idx, oracle, _docs = mlt_setup
    for doc_id, text in ROWS:
        tf = Counter(tokenize(text))
        want = [
            t for t, _w in sorted(
                (
                    (t, c * idf_fn(oracle.n_docs, oracle.df(t)))
                    for t, c in tf.items()
                ),
                key=lambda kv: (-kv[1], kv[0]),
            )[:3]
        ]
        got = more_like_this_terms(idx, text, m=3)
        assert got == want, (doc_id, got, want)


def test_mlt_excludes_source_and_matches_manual_query(mlt_setup):
    idx, _oracle, docs = mlt_setup
    for src in (0, 2, 7):
        terms = more_like_this_terms(
            idx, ROWS[src][1], m=3
        )
        got = [
            (r["doc_id"], r["score"])
            for r in more_like_this(idx, docs, src, m=3, k=5).collect()
        ]
        manual = [
            (d, s)
            for d, s in search_topk_rows(idx, " ".join(terms), k=6)
            if d != src
        ][:5]
        assert [d for d, _ in got] == [d for d, _ in manual], (src, got, manual)
        for (gd, gs), (md, ms) in zip(got, manual):
            assert math.isclose(gs, ms, rel_tol=1e-12), (src, gd)
        assert all(d != src for d, _ in got)


def test_mlt_missing_doc_raises(mlt_setup):
    idx, _oracle, docs = mlt_setup
    with pytest.raises(ValueError, match="not found"):
        more_like_this(idx, docs, 999)


@pytest.mark.parametrize("query", [
    "spark query", "rare merge fast", "spark", "vector table spark query",
])
def test_explain_contributions_sum_to_search_score(mlt_setup, query):
    idx, _oracle, _docs = mlt_setup
    top = search_topk_rows(idx, query, k=8)
    assert top
    for doc_id, score in top[:3]:
        rows = explain_score(idx, query, doc_id).collect()
        assert rows, (query, doc_id)
        total = sum(r["contribution"] for r in rows)
        assert math.isclose(total, score, rel_tol=1e-12), (query, doc_id)
        # per-term invariants: ascending term order, correct tf/df
        terms = [r["term"] for r in rows]
        assert terms == sorted(terms)
        for r in rows:
            tf = Counter(tokenize(ROWS[doc_id][1]))[r["term"]]
            assert r["tf"] == tf and tf > 0


def test_explain_skips_absent_terms_and_docs(mlt_setup):
    idx, _oracle, _docs = mlt_setup
    # doc 6 has no query terms -> empty explain
    assert explain_score(idx, "spark query", 6).count() == 0
    # term 'vector' absent from doc 0 -> no row for it
    rows = explain_score(idx, "spark vector", 0).collect()
    assert [r["term"] for r in rows] == ["spark"]
    # unknown doc / unknown query -> empty
    assert explain_score(idx, "spark", 12345).count() == 0
    assert explain_score(idx, "zzzz", 0).count() == 0


def test_explain_tuned_parameters(mlt_setup):
    idx, _oracle, _docs = mlt_setup
    (doc_id, score), *_ = search_topk_rows(idx, "spark merge", k=1,
                                           k1=0.9, b=0.3)
    rows = explain_score(idx, "spark merge", doc_id, k1=0.9, b=0.3).collect()
    total = sum(r["contribution"] for r in rows)
    assert math.isclose(total, score, rel_tol=1e-12)


def test_explain_similarity_sums_to_search_score(mlt_setup):
    idx, _oracle, _docs = mlt_setup
    for sim in ("lm_dirichlet", "tfidf", "boolean"):
        pairs = search_topk_rows(idx, "spark merge", k=100, similarity=sim)
        doc_id, score = pairs[0]
        rows = explain_score(idx, "spark merge", doc_id,
                             similarity=sim).collect()
        total = sum(r["contribution"] for r in rows)
        assert math.isclose(total, score, rel_tol=1e-12)


def test_explain_tombstoned_doc_is_empty(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path / "expl_tomb")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=2, n_buckets=4)
    ix = Index.load(spark, out)
    (doc_id, _), *_ = search_topk_rows(ix, "w00000", k=1)
    assert explain_score(ix, "w00000", doc_id).count() > 0
    delete_docs(ix, [doc_id])
    ix = Index.load(spark, out)
    assert explain_score(ix, "w00000", doc_id).count() == 0
