"""Hybrid BM25 + vector RRF fusion against a pure-Python reference."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.hybrid import (
    hybrid_topk,
    rank_branch,
    rrf_fuse,
)
from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    search_topk,
)
from hadoop_search_engine_spark.operators.similarity import cosine_topk

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


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic distinct unit-ish vectors
    rng = np.sin(np.arange(1, dim + 1, dtype=np.float64) * (i + 1) * 0.7)
    return [float(x) for x in rng]


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("hidx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=4)
    emb = spark.createDataFrame(
        [(i, _vec(i)) for i, _t in ROWS],
        "vec_id long, embedding array<float>",
    ).persist()
    return Index.load(spark, out), emb


def _py_rrf(branches, weights, rrf_k=60):
    """branches: list of ordered id lists (best first)."""
    acc = {}
    for ids, w in zip(branches, weights):
        for r, i in enumerate(ids, start=1):
            acc[i] = acc.get(i, 0.0) + w / (rrf_k + r)
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))


def test_hybrid_matches_python_reference(hybrid_setup):
    idx, emb = hybrid_setup
    qvec = _vec(1)
    lex = search_topk(idx, "spark merge", k=5).collect()
    lex_ids = [
        r["doc_id"]
        for r in sorted(lex, key=lambda r: (-round(r["score"], 4), r["doc_id"]))
    ]
    vec = cosine_topk(emb, qvec, k=5).collect()
    vec_ids = [
        r["vec_id"]
        for r in sorted(vec, key=lambda r: (-round(r["cosine"], 6), r["vec_id"]))
    ]
    want = _py_rrf([lex_ids, vec_ids], [1.0, 0.5])[:6]

    got = hybrid_topk(
        idx, "spark merge", emb, qvec, k=6, k_lex=5, k_vec=5,
        w_lex=1.0, w_vec=0.5,
    ).collect()
    assert [(r["doc_id"], round(r["rrf"], 6)) for r in got] == [
        (i, round(s, 6)) for i, s in want
    ]
    # rank columns: doc found by both branches carries both ranks
    both = set(lex_ids) & set(vec_ids)
    for r in got:
        if r["doc_id"] in both:
            assert r["lex_rank"] is not None and r["vec_rank"] is not None
        lr = lex_ids.index(r["doc_id"]) + 1 if r["doc_id"] in lex_ids else None
        assert r["lex_rank"] == lr


def test_hybrid_rrf_accumulates_across_branches(hybrid_setup):
    """A doc in BOTH branches must outrank a doc appearing in only one
    at comparable ranks (the point of RRF)."""
    idx, emb = hybrid_setup
    # query doc 0's own vector: doc 0 is cosine rank 1; "spark merge"
    # also ranks doc 0 highly -> fused rank 1 with contributions from both
    got = hybrid_topk(idx, "spark merge", emb, _vec(0), k=3, k_lex=5, k_vec=5)
    top = got.collect()[0]
    assert top["doc_id"] == 0
    assert top["lex_rank"] is not None and top["vec_rank"] == 1
    assert abs(top["rrf"] - (1.0 / (60 + top["lex_rank"]) + 1.0 / 61)) < 1e-6


def test_rank_branch_rounds_before_ranking(spark):
    # two scores equal at 4 dp -> tie broken by id, not raw float order
    df = spark.createDataFrame(
        [(7, 1.00001), (3, 1.00004), (5, 0.5)], "doc_id long, score double"
    )
    ranked = {r["doc_id"]: r["rank"] for r in rank_branch(df, "score").collect()}
    assert ranked == {3: 1, 7: 2, 5: 3}


def test_rrf_fuse_validates_alignment(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError, match="align"):
        rrf_fuse([df, df], weights=[1.0], names=["a", "b"])


def test_hybrid_deterministic_under_repartition(hybrid_setup):
    idx, emb = hybrid_setup
    qvec = _vec(2)
    a = hybrid_topk(idx, "spark query", emb, qvec, k=6).collect()
    b = hybrid_topk(idx, "spark query", emb.repartition(5), qvec, k=6).collect()
    assert [(r["doc_id"], r["rrf"]) for r in a] == [
        (r["doc_id"], r["rrf"]) for r in b
    ]


def test_rrf_fuse_empty_branches_raises(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rescore_matches_python_reference(spark, hybrid_setup):
    """rescore_topk == BM25 window -> qw*bm25 + rw*cos recombine,
    recomputed in pure Python from the branch results."""
    from hadoop_search_engine_spark.operators.hybrid import rescore_topk

    ix, emb = hybrid_setup
    qvec = _vec(3)
    win = {
        r["doc_id"]: round(r["score"], 4)
        for r in search_topk(ix, "spark query", k=6).collect()
    }
    ev = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b))
        return round(num / den, 6)

    want = sorted(
        (
            (i, round(1.0 * bm + 2.0 * cos(ev[i], qvec), 6))
            for i, bm in win.items()
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    got = [
        (r["doc_id"], r["score"])
        for r in rescore_topk(
            ix, "spark query", emb, qvec, window=6, k=3,
            query_weight=1.0, rescore_weight=2.0,
        ).collect()
    ]
    assert got == want


def test_rescore_can_promote_from_outside_bm25_topk(spark, hybrid_setup):
    """With a big rescore weight, a doc ranked low by BM25 inside the
    window must be able to win the final top-1 (the point of the
    window being larger than k)."""
    from hadoop_search_engine_spark.operators.hybrid import rescore_topk

    ix, emb = hybrid_setup
    bm_order = [r["doc_id"]
                for r in search_topk(ix, "spark query", k=6).collect()]
    last = bm_order[-1]
    top = rescore_topk(
        ix, "spark query", emb, _vec(last), window=6, k=1,
        query_weight=0.0, rescore_weight=100.0,
    ).collect()
    assert top[0]["doc_id"] == last  # its own vector: cosine 1.0
    assert abs(top[0]["secondary"] - 1.0) < 1e-6


def test_rescore_modes_and_missing_embedding(spark, hybrid_setup):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.hybrid import rescore_topk

    ix, emb = hybrid_setup
    # drop doc 0's vector: it must survive with secondary == 0
    emb2 = emb.where(F.col("vec_id") != 0)
    out = {r["doc_id"]: r for r in rescore_topk(
        ix, "spark query", emb2, _vec(3), window=6, k=6).collect()}
    assert 0 in out and out[0]["secondary"] == 0.0
    assert out[0]["score"] == out[0]["bm25"]  # total mode, cos 0

    rep = rescore_topk(ix, "spark query", emb, _vec(3), window=6, k=6,
                       score_mode="replace", rescore_weight=1.0)
    for r in rep.collect():
        assert abs(r["score"] - r["secondary"]) < 1e-9

    mul = {r["doc_id"]: r for r in rescore_topk(
        ix, "spark query", emb, _vec(3), window=6, k=6,
        score_mode="multiply").collect()}
    for i, r in mul.items():
        assert abs(r["score"] - round(r["bm25"] * r["secondary"], 6)) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="score_mode"):
        rescore_topk(ix, "spark query", emb, _vec(3), score_mode="avg")


def _py_mmr(win, vecs, k, lam):
    """Greedy MMR mirroring hybrid.mmr_rerank's determinism contract:
    bm25 at 4 dp, rel/cosines/score at 6 dp, maxsim floored at 0,
    missing embeddings cosine-0, ties by ascending doc_id."""
    ids = [i for i, _b in win]
    bm = {i: round(b, 4) for i, b in win}
    bmax = max(bm.values())
    rel = {i: round(bm[i] / bmax, 6) for i in ids}

    def cos(a, b):
        va, vb = vecs.get(a), vecs.get(b)
        if va is None or vb is None:
            return 0.0
        na = math.sqrt(sum(x * x for x in va)) or 1.0
        nb = math.sqrt(sum(x * x for x in vb)) or 1.0
        return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)

    picked, maxsim, out = [], {i: 0.0 for i in ids}, []
    remaining = set(ids)
    for rank in range(1, min(k, len(ids)) + 1):
        best = min(
            remaining,
            key=lambda i: (-round(lam * rel[i] - (1 - lam) * maxsim[i], 6), i),
        )
        out.append(
            (best, rank,
             round(lam * rel[best] - (1 - lam) * maxsim[best], 6), bm[best])
        )
        remaining.discard(best)
        picked.append(best)
        for i in ids:
            maxsim[i] = max(maxsim[i], cos(i, best))
    return out


def test_mmr_matches_python_reference(hybrid_setup):
    from hadoop_search_engine_spark.operators.hybrid import mmr_rerank

    ix, emb = hybrid_setup
    # drop one doc's vector to exercise the cosine-0 path
    emb2 = emb.where(F.col("vec_id") != 3)
    win = [
        (r["doc_id"], round(r["score"], 4))
        for r in search_topk(ix, "spark query merge", k=6).collect()
    ]
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb2.collect()}
    for lam in (0.3, 0.7, 1.0):
        want = _py_mmr(win, vecs, k=4, lam=lam)
        got = [
            (r["doc_id"], r["mmr_rank"], r["mmr_score"], r["bm25"])
            for r in mmr_rerank(
                ix, "spark query merge", emb2, k=4, window=6, lam=lam
            ).orderBy("mmr_rank").collect()
        ]
        assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want], lam
        for g, w in zip(got, want):
            assert abs(g[2] - w[2]) < 1e-9 and abs(g[3] - w[3]) < 1e-9


def test_mmr_demotes_duplicate_vectors(hybrid_setup, spark):
    """Two top-BM25 docs sharing an identical vector: after the first
    is picked, the clone's cosine-1 redundancy must push it below a
    relevant-but-different doc (the point of MMR)."""
    from hadoop_search_engine_spark.operators.hybrid import mmr_rerank

    ix, _ = hybrid_setup
    bm_order = [r["doc_id"]
                for r in search_topk(ix, "spark query", k=4).collect()]
    a, b = bm_order[0], bm_order[1]
    emb = spark.createDataFrame(
        [(i, _vec(a) if i in (a, b) else _vec(i + 50))
         for i in bm_order],
        "vec_id long, embedding array<float>",
    )
    got = [r["doc_id"] for r in mmr_rerank(
        ix, "spark query", emb, k=4, window=4, lam=0.5
    ).orderBy("mmr_rank").collect()]
    assert got[0] == a            # first pick is the plain BM25 winner
    assert got[1] != b            # the vector clone is demoted
    assert b in got               # ...but never dropped


def test_mmr_lam_one_is_plain_bm25_order(hybrid_setup):
    from hadoop_search_engine_spark.operators.hybrid import mmr_rerank

    ix, emb = hybrid_setup
    bm_order = [
        (r["doc_id"], round(r["score"], 4))
        for r in search_topk(ix, "spark merge", k=5).collect()
    ]
    bm_order.sort(key=lambda t: (-t[1], t[0]))
    got = [r["doc_id"] for r in mmr_rerank(
        ix, "spark merge", emb, k=5, window=5, lam=1.0
    ).orderBy("mmr_rank").collect()]
    assert got == [i for i, _s in bm_order]

    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(ix, "spark merge", emb, lam=1.5)
