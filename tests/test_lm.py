"""Corpus n-gram LM: training counts, Stupid-Backoff perplexity
(hand-computed reference), the band filter, external-LM scoring, and
the phrase suggester (planted-misspelling recovery, tie/ordering
determinism, lattice exactness vs brute-force path enumeration)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.lm import (
    BACKOFF,
    EDIT_LLQ,
    LLQ_SCALE,
    doc_perplexity,
    perplexity_filter,
    read_lm,
    suggest_phrase,
    train_lm,
    write_lm,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_lm(texts):
    """Pure-Python reference: unigram/bigram counts + totals."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in texts:
        toks = tokenize(t)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, sum(uni.values()), len(uni)


def _py_llq(toks, uni, big, n, v):
    out = []
    for i, w in enumerate(toks):
        p_uni = (uni.get(w, 0) + 1) / (n + v + 1)
        if i == 0:
            s = p_uni
        else:
            cb = big.get((toks[i - 1], w), 0)
            cp = uni.get(toks[i - 1], 0)
            s = (cb / cp) if cb > 0 and cp > 0 else BACKOFF * p_uni
        out.append(round(math.log(s) * LLQ_SCALE))
    return out


TEXTS = [
    "the fast fox jumps over the lazy dog",
    "the fast fox runs",
    "a lazy dog sleeps",
    "",  # token-less doc
]


def test_train_lm_counts(spark):
    uni, big = train_lm(_docs(spark, TEXTS))
    got_uni = {r["term"]: r["count"] for r in uni.collect()}
    got_big = {(r["w_prev"], r["w"]): r["count"] for r in big.collect()}
    ref_uni, ref_big, _, _ = _py_lm(TEXTS)
    assert got_uni == ref_uni
    assert got_big == ref_big


def test_doc_perplexity_matches_hand_reference(spark):
    docs = _docs(spark, TEXTS)
    rows = {r["doc_id"]: r for r in doc_perplexity(docs).collect()}
    uni, big, n, v = _py_lm(TEXTS)
    assert len(rows) == len(TEXTS)
    for i, t in enumerate(TEXTS):
        toks = tokenize(t)
        llqs = _py_llq(toks, uni, big, n, v)
        assert rows[i]["n_tokens"] == len(toks)
        assert rows[i]["sum_llq"] == sum(llqs)
        if toks:
            want = math.exp(-(sum(llqs) / LLQ_SCALE) / len(toks))
            assert rows[i]["ppl"] == pytest.approx(want, rel=1e-12)
        else:
            assert rows[i]["ppl"] == 0.0


def test_perplexity_is_deterministic_across_reruns(spark):
    docs = _docs(spark, TEXTS).repartition(3)
    a = sorted(doc_perplexity(docs).collect())
    b = sorted(doc_perplexity(docs.repartition(7)).collect())
    assert a == b  # int64 micro-nat sums are order-free


def test_perplexity_filter_band_and_empty_doc(spark):
    docs = _docs(spark, TEXTS)
    ppl = {r["doc_id"]: r["ppl"] for r in doc_perplexity(docs).collect()}
    nonzero = sorted(p for p in ppl.values() if p > 0)
    cut = nonzero[1]  # keep the two lowest-ppl docs + the empty doc
    kept = {r["doc_id"] for r in
            perplexity_filter(docs, max_ppl=cut).collect()}
    want = {i for i, p in ppl.items() if 0 < p <= cut} | {3}
    assert kept == want
    # min_ppl cuts the head too
    kept2 = {r["doc_id"] for r in
             perplexity_filter(docs, max_ppl=1e9, min_ppl=cut + 1e-9).collect()}
    assert kept2 == ({i for i, p in ppl.items() if p > cut} | {3})


def test_external_lm_scores_oov(spark):
    """Train on a reference corpus, score a target with OOV words —
    every OOV token costs the unseen mass ln(1/(N+V+1)) (+ backoff
    after the first position)."""
    ref = _docs(spark, ["the fast fox", "the lazy dog"])
    uni, big = train_lm(ref)
    target = _docs(spark, ["zzz qqq"])
    row = doc_perplexity(target, uni, big).collect()[0]
    _, _, n, v = _py_lm(["the fast fox", "the lazy dog"])
    p_unseen = 1 / (n + v + 1)
    want = (round(math.log(p_unseen) * LLQ_SCALE)
            + round(math.log(BACKOFF * p_unseen) * LLQ_SCALE))
    assert row["sum_llq"] == want
    assert row["n_tokens"] == 2


def test_lm_roundtrip_parquet(spark, tmp_path):
    docs = _docs(spark, TEXTS)
    uni, big = train_lm(docs)
    write_lm(uni, big, str(tmp_path / "lm"))
    uni2, big2 = read_lm(spark, str(tmp_path / "lm"))
    assert sorted(uni.collect()) == sorted(uni2.collect())
    assert sorted(big.collect()) == sorted(big2.collect())


# ---------------------------------------------------------------------------
# phrase suggester
# ---------------------------------------------------------------------------

def test_suggest_recovers_planted_misspelling(spark):
    docs = _docs(spark, TEXTS)
    uni, big = train_lm(docs)
    # "thw"/"fasd"/"fxo" are each 1 Levenshtein edit from the truth
    # (plain Levenshtein — a "teh" transposition would be 2 edits)
    got = suggest_phrase(spark, "thw fasd fox", uni, big).collect()
    assert got and got[0]["suggestion"] == "the fast fox"


def test_suggest_empty_when_no_candidates(spark):
    docs = _docs(spark, TEXTS)
    uni, big = train_lm(docs)
    assert suggest_phrase(spark, "qqqqqqqqq fox", uni, big).count() == 0
    assert suggest_phrase(spark, "", uni, big).count() == 0


def test_suggest_matches_bruteforce_enumeration(spark):
    """k-best Viterbi == exhaustive path enumeration with the same
    scoring — on a corpus engineered so several lattice paths compete."""
    texts = [
        "red cat red bat red rat",
        "red cat red cat",
        "bed cat bed bat",
        "ted rat ted bat ted cat",
    ]
    docs = _docs(spark, texts)
    uni_df, big_df = train_lm(docs)
    uni, big, n, v = _py_lm(texts)
    query = "ed cat ed bat"
    q_toks = tokenize(query)
    max_edits, per_token, topn = 1, 5, 4

    # brute force: candidate sets by the same cap rule, every path scored
    def cands(tok):
        cs = []
        for term, c in uni.items():
            d = _lev(term, tok)
            if d <= max_edits:
                cs.append((d, -c, term))
        cs.sort()
        return [(t, d, -negc) for d, negc, t in cs[:per_token]]

    def _lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    sets = [cands(t) for t in q_toks]
    assert all(sets)
    import itertools
    paths = []
    for combo in itertools.product(*sets):
        toks = [t for t, _, _ in combo]
        llqs = _py_llq(toks, uni, big, n, v)
        score = sum(llqs) + sum(d * EDIT_LLQ for _, d, _ in combo)
        paths.append((-score, " ".join(toks)))
    paths.sort()
    want = [(text, -s / LLQ_SCALE) for s, text in paths[:topn]]

    got = [(r["suggestion"], r["score"]) for r in suggest_phrase(
        spark, query, uni_df, big_df,
        max_edits=max_edits, per_token=per_token, topn=topn,
    ).collect()]
    assert got == want


def test_suggest_single_token_is_unigram_ranked(spark):
    texts = ["red red red bed", "ted bed"]
    docs = _docs(spark, texts)
    uni_df, big_df = train_lm(docs)
    got = [r["suggestion"] for r in
           suggest_phrase(spark, "zed", uni_df, big_df, topn=3).collect()]
    # all dist-1; unigram LM score ranks by count desc, then text asc
    assert got == ["red", "bed", "ted"]
