"""DSIR importance resampling (operators/dsir.py): pure-Python
reference parity, determinism/nesting invariants, and selection
quality (target-like docs float to the top)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref_str
from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.dsir import (
    LLQ_SCALE,
    dsir_select,
    dsir_weights,
    feature_log_ratios,
)

NF = 256


def _ref_grams(text: str) -> list[str]:
    toks = tokenize(text)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights(
    raw: list[tuple[int, str]], target: list[tuple[int, str]], nf: int
) -> dict[int, int]:
    """Independent pure-Python replay of the whole DSIR pipeline."""
    raw_c: dict[int, int] = {}
    tgt_c: dict[int, int] = {}
    doc_feats: dict[int, list[int]] = {}
    for did, text in raw:
        feats = [mm3_u32_ref_str(g) % nf for g in _ref_grams(text)]
        doc_feats[did] = feats
        for f in feats:
            raw_c[f] = raw_c.get(f, 0) + 1
    for _did, text in target:
        for g in _ref_grams(text):
            f = mm3_u32_ref_str(g) % nf
            tgt_c[f] = tgt_c.get(f, 0) + 1
    n_raw, n_tgt = sum(raw_c.values()), sum(tgt_c.values())
    lam = {
        f: round(math.log((tgt_c.get(f, 0) + 1) / (n_tgt + nf)) * LLQ_SCALE)
        - round(math.log((raw_c.get(f, 0) + 1) / (n_raw + nf)) * LLQ_SCALE)
        for f in set(raw_c) | set(tgt_c)
    }
    return {
        did: sum(lam[f] for f in feats)
        for did, feats in doc_feats.items()
    }


def test_dsir_weights_match_pure_python_reference(spark, tiny_corpus):
    raw = [(r["doc_id"], r["text"]) for r in
           tiny_corpus.select("doc_id", "text").collect()]
    tgt_df = tiny_corpus.where(F.col("lang") == "en")
    target = [(r["doc_id"], r["text"]) for r in
              tgt_df.select("doc_id", "text").collect()]
    assert 0 < len(target) < len(raw)
    expect = _ref_weights(raw, target, NF)
    got = {
        r["doc_id"]: r["dsir_llq"]
        for r in dsir_weights(tiny_corpus, tgt_df, n_features=NF).collect()
    }
    assert got == expect


def test_dsir_weights_partition_invariant(spark, tiny_corpus):
    tgt = tiny_corpus.where(F.col("lang") == "en")
    a = dsir_weights(tiny_corpus, tgt, n_features=NF)
    b = dsir_weights(
        tiny_corpus.repartition(7), tgt.repartition(3), n_features=NF
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_ratio_table_is_bounded_and_reusable(spark, tiny_corpus):
    tgt = tiny_corpus.where(F.col("lang") == "en")
    ratios = feature_log_ratios(tiny_corpus, tgt, n_features=NF)
    assert ratios.count() <= NF
    via_target = dsir_weights(tiny_corpus, target_docs=tgt, n_features=NF)
    via_ratios = dsir_weights(tiny_corpus, ratios=ratios, n_features=NF)
    assert sorted(map(tuple, via_target.collect())) == sorted(
        map(tuple, via_ratios.collect())
    )


def test_dsir_select_prefix_nesting_and_quality(spark, tiny_corpus):
    tgt = tiny_corpus.where(F.col("lang") == "en")
    top20 = dsir_select(tiny_corpus, tgt, k=20, n_features=NF)
    top50 = dsir_select(tiny_corpus, tgt, k=50, n_features=NF)
    ids20 = {r["doc_id"] for r in top20.collect()}
    ids50 = {r["doc_id"] for r in top50.collect()}
    assert len(ids20) == 20 and len(ids50) == 50
    # a fixed (salt, T) ordering makes smaller k a strict prefix
    assert ids20 < ids50
    # near-zero temperature degenerates to hard top-k by weight:
    # the target language must dominate
    hard = dsir_select(tiny_corpus, tgt, k=20, n_features=NF,
                       temperature=1e-9)
    langs = [r["lang"] for r in hard.collect()]
    en_share_corpus = tgt.count() / tiny_corpus.count()
    assert langs.count("en") / len(langs) > max(0.9, en_share_corpus)


def test_dsir_select_keys_are_weight_plus_gumbel(spark, tiny_corpus):
    tgt = tiny_corpus.where(F.col("lang") == "en")
    sel = dsir_select(tiny_corpus, tgt, k=10, n_features=NF).collect()
    for r in sel:
        u = (mm3_u32_ref_str(str(r["doc_id"]), salt="dsir") + 0.5) / 2**32
        g = round(-math.log(-math.log(u)) * LLQ_SCALE)
        assert r["key_llq"] == r["dsir_llq"] + g


def test_dsir_gramless_docs_get_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "spark rows"), (2, ""), (3, "..."),
         (4, "unrelated other words entirely")],
        ["doc_id", "text"],
    )
    tgt = docs.where("doc_id = 1")
    w = {r["doc_id"]: r["dsir_llq"]
         for r in dsir_weights(docs, tgt, n_features=NF).collect()}
    assert set(w) == {1, 2, 3, 4}
    # token-less docs keep a zero-weight row; target-like grams score
    # positive, off-target grams negative
    assert w[2] == 0 and w[3] == 0 and w[1] > 0 and w[4] < 0


def test_dsir_argument_validation(spark, tiny_corpus):
    tgt = tiny_corpus.where(F.col("lang") == "en")
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(tiny_corpus)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(
            tiny_corpus, target_docs=tgt,
            ratios=feature_log_ratios(tiny_corpus, tgt, NF),
        )
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(tiny_corpus, tgt, k=-1, n_features=NF)
    with pytest.raises(ValueError, match="n_features"):
        dsir_weights(tiny_corpus, tgt, n_features=1)
