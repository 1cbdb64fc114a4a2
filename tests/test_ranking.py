"""Pluggable similarities (operators/ranking.py): LM Dirichlet,
classic TF-IDF, boolean — parity with a pure-Python reference scorer,
cross-serving/cross-algorithm identity, boosts, tombstones, errors.

The reference engine ranks by posting order only (server/src/services/
search.service.js:58-90); the similarity-module surface is the
Lucene/ES capability this engine adds on the same index.
"""

from __future__ import annotations

import math
import shutil
from collections import Counter

import pytest

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    search_topk,
    search_topk_rows,
)
from hadoop_search_engine_spark.operators.ranking import (
    BM25,
    BooleanSim,
    ClassicTFIDF,
    LMDirichlet,
    resolve_similarity,
)

def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _close(a, b, tol=1e-9):
    return len(a) == len(b) and all(
        x[0] == y[0] and abs(x[1] - y[1]) <= tol for x, y in zip(a, b)
    )


@pytest.fixture(scope="module")
def corpus_model(tiny_corpus):
    """postings/doc-length model recomputed independently of the
    index (tokenize straight off the corpus rows)."""
    postings: dict[str, dict[int, int]] = {}
    dls: dict[int, int] = {}
    for r in tiny_corpus.select("doc_id", "text").collect():
        toks = tokenize(r["text"])
        if not toks:
            continue
        dls[int(r["doc_id"])] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[int(r["doc_id"])] = tf
    return postings, dls


def _ref_search(corpus_model, terms, sim, k=10, boosts=None, mode="or"):
    """Brute-force reference: per matched term, the similarity's
    contribution, summed per doc; (score desc, doc_id asc) top-k."""
    postings, dls = corpus_model
    N, T = len(dls), sum(dls.values())
    boosts = boosts or {}
    scores: dict[int, float] = {}
    seen: dict[int, int] = {}
    for t in sorted(set(terms)):
        plist = postings.get(t, {})
        df, ctf = len(plist), sum(plist.values())
        w = boosts.get(t, 1.0)
        for d, tf in plist.items():
            dl = dls[d]
            if isinstance(sim, LMDirichlet):
                p = ctf / T
                s = w * max(
                    0.0,
                    math.log1p(tf / (sim.mu * p))
                    + math.log(sim.mu / (dl + sim.mu)),
                )
            elif isinstance(sim, ClassicTFIDF):
                idf = 1.0 + math.log(N / (df + 1.0))
                s = w * idf * idf * math.sqrt(tf) / math.sqrt(dl)
            else:
                s = w
            scores[d] = scores.get(d, 0.0) + s
            seen[d] = seen.get(d, 0) + 1
    if mode == "and":
        need = len(set(terms))
        scores = {d: s for d, s in scores.items() if seen.get(d) == need}
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


QUERY = "w00000 w00001 w00017"


@pytest.mark.parametrize("sim", [LMDirichlet(), ClassicTFIDF(), BooleanSim()])
def test_matches_bruteforce_reference_all_paths(tiny_index, corpus_model, sim):
    ref = _ref_search(corpus_model, QUERY.split(), sim, k=10)
    drv = search_topk_rows(tiny_index, QUERY, k=10, similarity=sim)
    spk = _pairs(search_topk(tiny_index, QUERY, k=10, serving="spark",
                             similarity=sim))
    assert _close(drv, ref)
    assert _close(spk, ref)


@pytest.mark.parametrize("sim", ["lm_dirichlet", "tfidf"])
@pytest.mark.parametrize("mode", ["or", "and"])
def test_wand_equals_dense(tiny_index, sim, mode):
    # a bound violation (ranking.py's monotonicity contract broken)
    # would make WAND prune a winner — the identity is the bound check
    w = search_topk_rows(tiny_index, QUERY, k=10, mode=mode,
                         algorithm="wand", similarity=sim)
    d = search_topk_rows(tiny_index, QUERY, k=10, mode=mode,
                         algorithm="dense", similarity=sim)
    assert w == d
    assert len(w) > 0


def test_and_mode_matches_reference(tiny_index, corpus_model):
    sim = LMDirichlet()
    ref = _ref_search(corpus_model, QUERY.split(), sim, k=10, mode="and")
    got = search_topk_rows(tiny_index, QUERY, k=10, mode="and",
                           similarity=sim)
    assert _close(got, ref)


def test_boolean_score_is_matched_term_count(tiny_index):
    got = search_topk_rows(tiny_index, "w00000 w00001", k=5,
                           similarity="boolean")
    assert got and all(s in (1.0, 2.0) for _, s in got)
    assert got[0][1] == 2.0  # docs matching both terms rank first


def test_boost_scales_contribution(tiny_index, corpus_model):
    sim = ClassicTFIDF()
    ref = _ref_search(corpus_model, ["w00000", "w00001"], sim, k=10,
                      boosts={"w00000": 2.0})
    got = search_topk_rows(tiny_index, "w00000^2 w00001", k=10,
                           similarity=sim)
    assert _close(got, ref)


def test_mu_parameter_changes_scores(tiny_index, corpus_model):
    a = search_topk_rows(tiny_index, QUERY, k=5,
                         similarity=LMDirichlet(mu=500.0))
    ref = _ref_search(corpus_model, QUERY.split(), LMDirichlet(mu=500.0), k=5)
    assert _close(a, ref)
    b = search_topk_rows(tiny_index, QUERY, k=5, similarity=LMDirichlet())
    assert a != b


def test_pagination_composes(tiny_index):
    sim = "lm_dirichlet"
    full = search_topk_rows(tiny_index, QUERY, k=10, similarity=sim)
    page1 = search_topk_rows(tiny_index, QUERY, k=5, similarity=sim)
    page2 = search_topk_rows(tiny_index, QUERY, k=5, similarity=sim,
                             after=page1[-1])
    assert page1 + page2 == full


def test_tombstones_excluded(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs

    out = str(tmp_path / "tomb")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=4, n_buckets=8, block_size=16)
    ix = Index.load(spark, out)
    before = search_topk_rows(ix, QUERY, k=5, similarity="tfidf")
    victim = before[0][0]
    delete_docs(ix, [victim])
    ix = Index.load(spark, out)
    after = search_topk_rows(ix, QUERY, k=5, similarity="tfidf")
    assert all(d != victim for d, _ in after)
    # statistics stay global: surviving docs keep their exact scores
    assert _close([p for p in before if p[0] != victim], after[:4])


def test_ctf_matches_reference_counts(tiny_index, corpus_model):
    postings, dls = corpus_model
    lex = {
        r["term"]: int(r["ctf"])
        for r in tiny_index.lexicon.where(
            "term in ('w00000','w00001','w00017')").collect()
    }
    for t, ctf in lex.items():
        assert ctf == sum(postings[t].values())
    assert tiny_index.total_tokens() == sum(dls.values())


def test_resolve_similarity_names():
    assert resolve_similarity(None) is None
    assert resolve_similarity("bm25") is None
    assert resolve_similarity(BM25()) is None
    assert isinstance(resolve_similarity("lm_dirichlet"), LMDirichlet)
    assert isinstance(resolve_similarity("classic"), ClassicTFIDF)
    with pytest.raises(ValueError, match="unknown similarity"):
        resolve_similarity("pagerank")
    with pytest.raises(ValueError, match="mu must be > 0"):
        LMDirichlet(mu=0.0)


def test_k1_b_rejected_with_similarity(tiny_index):
    with pytest.raises(ValueError, match="BM25 parameters"):
        search_topk_rows(tiny_index, QUERY, k=5, similarity="tfidf", k1=2.0)
    with pytest.raises(ValueError, match="BM25 parameters"):
        search_topk(tiny_index, QUERY, k=5, similarity="lm_dirichlet", b=0.5)


def test_lm_requires_ctf_column(spark, tiny_index, tmp_path):
    # simulate a pre-ctf index: copy, rewrite the lexicon without ctf
    legacy = str(tmp_path / "legacy")
    shutil.copytree(tiny_index.out_dir, legacy)
    lex = spark.read.parquet(f"{tiny_index.out_dir}/lexicon").drop("ctf")
    shutil.rmtree(f"{legacy}/lexicon")
    lex.write.parquet(f"{legacy}/lexicon")
    ix = Index.load(spark, legacy)
    assert search_topk_rows(ix, QUERY, k=5)  # BM25 unaffected
    with pytest.raises(ValueError, match="ctf"):
        search_topk_rows(ix, QUERY, k=5, similarity="lm_dirichlet")
