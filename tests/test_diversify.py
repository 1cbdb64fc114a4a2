"""MMR diversification: lam=1 degrades to input order, near-duplicate
demotion, missing-embedding handling."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_search_engine_spark.operators.diversify import mmr_rerank


def _setup(spark):
    # candidates: docs 0,1 nearly identical vectors; doc 2 orthogonal;
    # relevance order 0 > 1 > 2
    topk = spark.createDataFrame(
        [(0, 10.0), (1, 9.5), (2, 5.0), (3, 4.0)],
        "doc_id long, score double",
    )
    v0 = [1.0, 0.0, 0.0, 0.0]
    v1 = [0.999, 0.04, 0.0, 0.0]
    v2 = [0.0, 0.0, 1.0, 0.0]
    # doc 3 has NO embedding row
    emb = spark.createDataFrame(
        [(0, v0), (1, v1), (2, v2)],
        "vec_id long, embedding array<double>",
    )
    return topk, emb


def test_lam_one_is_input_ranking(spark):
    topk, emb = _setup(spark)
    out = mmr_rerank(topk, emb, k=4, lam=1.0).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_near_duplicate_demoted(spark):
    topk, emb = _setup(spark)
    out = mmr_rerank(topk, emb, k=3, lam=0.5).collect()
    order = [r["doc_id"] for r in out]
    # doc 1 is ~identical to the already-picked doc 0 -> the orthogonal
    # doc 2 (and the incomparable doc 3) outrank it despite lower bm25
    assert order[0] == 0
    assert order.index(2) < (order.index(1) if 1 in order else 99)


def test_missing_embedding_never_redundant(spark):
    topk, emb = _setup(spark)
    out = mmr_rerank(topk, emb, k=4, lam=0.5).collect()
    r3 = next(r for r in out if r["doc_id"] == 3)
    # doc 3's redundancy is 0 by definition; with rel_n ~0 its MMR is
    # ~0 but never negative from similarity
    assert r3["mmr"] >= -1e-9


def test_validation_and_empty(spark):
    topk, emb = _setup(spark)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(topk, emb, lam=1.5)
    empty = topk.where("doc_id < 0")
    assert mmr_rerank(empty, emb, k=3).count() == 0
