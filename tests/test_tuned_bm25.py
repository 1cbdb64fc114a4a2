"""Query-time BM25 (k1, b) overrides: any parameterization serves from
the same index — blocks store raw (max_tf, min_dl), not score bounds."""

import math

import pytest

from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle
from hadoop_search_engine_spark.operators.query_exec import (
    search_topk,
    search_topk_batch,
)

TUNED = dict(k1=0.9, b=0.25)


@pytest.fixture(scope="module")
def tuned_oracle(tiny_corpus):
    rows = tiny_corpus.select("doc_id", "text").collect()
    return BM25Oracle([(r["doc_id"], r["text"]) for r in rows], **TUNED)


@pytest.mark.parametrize("algorithm", ["wand", "dense"])
@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_tuned_matches_tuned_oracle(tiny_index, tuned_oracle, algorithm, serving):
    for qtext in ["needle7", "w00000 w00001", "needle3 w00002"]:
        want = tuned_oracle.search(qtext, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in search_topk(
                tiny_index, qtext, k=10, algorithm=algorithm,
                serving=serving, **TUNED,
            ).collect()
        ]
        assert len(got) == len(want), qtext
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gd == wd, qtext
            assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12), qtext


def test_tuned_differs_from_default(tiny_index):
    base = search_topk(tiny_index, "w00000 w00001", k=5).collect()
    tuned = search_topk(tiny_index, "w00000 w00001", k=5, **TUNED).collect()
    assert [r["score"] for r in base] != [r["score"] for r in tuned]


def test_batch_tuned_matches_per_query(tiny_index):
    qs = {"a": "needle7", "b": "w00000 w00001"}
    got = {}
    for r in search_topk_batch(tiny_index, qs, k=10, **TUNED).collect():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, text in qs.items():
        want = [
            (r["doc_id"], r["score"])
            for r in search_topk(tiny_index, text, k=10, **TUNED).collect()
        ]
        assert got.get(qid, []) == want, qid
