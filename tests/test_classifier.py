"""Learned quality classifier (operators/classifier.py): pure-Python
GD replay parity, convergence on a separable two-vocab corpus,
partitioning invariance, and gate semantics."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref_str
from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.classifier import (
    classifier_filter,
    score_text_classifier,
    train_text_classifier,
)
from hadoop_search_engine_spark.operators.dsir import LLQ_SCALE

NF = 64


def _rnd(x: float) -> int:
    """Round half away from zero — Spark ``F.round`` / DuckDB ``round``
    semantics (Python's built-in ``round`` is banker's and never used)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _ref_feats(text: str, nf: int) -> set[int]:
    toks = tokenize(text)
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return {mm3_u32_ref_str(g) % nf for g in grams} | {nf}  # + intercept


def _ref_train(
    docs: list[tuple[int, str, int]], nf: int, iters: int, lr: float
) -> dict[int, int]:
    """Independent replay of the full quantized-GD loop."""
    feats = {did: _ref_feats(text, nf) for did, text, _y in docs}
    n = len(docs)
    wq: dict[int, int] = {}
    for _ in range(iters):
        grad: dict[int, int] = {}
        for did, _text, y in docs:
            mm = sum(wq.get(f, 0) for f in feats[did])
            p = 1.0 / (1.0 + math.exp(-(mm / float(LLQ_SCALE))))
            r = _rnd((p - y) * LLQ_SCALE)
            for f in feats[did]:
                grad[f] = grad.get(f, 0) + r
        for f, g in grad.items():
            d = _rnd(lr * g / n)
            if d:
                wq[f] = wq.get(f, 0) - d
    return {f: w for f, w in wq.items() if w}


def _two_vocab_rows(n_per_class: int = 120) -> list[tuple[int, str, int]]:
    rng = random.Random(7)
    common = [f"c{i}" for i in range(30)]
    voc = {1: [f"aa{i}" for i in range(80)], 0: [f"bb{i}" for i in range(80)]}
    rows = []
    for y in (1, 0):
        for i in range(n_per_class):
            L = rng.randint(15, 80)
            text = " ".join(
                rng.choice(voc[y]) if rng.random() < 0.35 else rng.choice(common)
                for _ in range(L)
            )
            rows.append((y * n_per_class * 10 + i, text, y))
    return rows


@pytest.fixture(scope="module")
def two_vocab(spark):
    rows = _two_vocab_rows()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, label long"
    ).repartition(4).persist()
    df.count()
    return rows, df


def test_weights_match_pure_python_replay(spark, two_vocab):
    rows, df = two_vocab
    got = {
        r["feature"]: r["wq"]
        for r in train_text_classifier(
            df, n_features=NF, iters=3, lr=0.5
        ).collect()
    }
    assert got == _ref_train(rows, NF, iters=3, lr=0.5)


def test_scores_match_pure_python_replay(spark, two_vocab):
    rows, df = two_vocab
    w = train_text_classifier(df, n_features=NF, iters=3, lr=0.5)
    wq = {r["feature"]: r["wq"] for r in w.collect()}
    got = {
        r["doc_id"]: r["logit_micro"]
        for r in score_text_classifier(df, w, n_features=NF).collect()
    }
    want = {
        did: sum(wq.get(f, 0) for f in _ref_feats(text, NF))
        for did, text, _y in rows
    }
    assert got == want


def test_converges_and_gates_on_separable_corpus(spark, two_vocab):
    _rows, df = two_vocab
    w = train_text_classifier(df, n_features=4096, iters=5, lr=0.5)
    scored = score_text_classifier(df, w, n_features=4096)
    acc = (
        scored.join(df, "doc_id")
        .select(
            ((F.col("prob") >= 0.5).cast("int") == F.col("label"))
            .cast("int").alias("ok")
        )
        .agg(F.avg("ok")).first()[0]
    )
    assert acc >= 0.95
    kept = classifier_filter(df, w, min_prob=0.5, n_features=4096)
    assert kept.columns == df.columns
    n_pos = df.where("label = 1").count()
    assert abs(kept.count() - n_pos) <= 0.05 * n_pos
    # threshold monotonicity: a stricter gate keeps a subset
    strict = classifier_filter(df, w, min_prob=0.9, n_features=4096)
    assert strict.count() <= kept.count()
    assert strict.join(kept, "doc_id", "left_anti").count() == 0


def test_training_is_partitioning_invariant(spark, two_vocab):
    _rows, df = two_vocab
    a = train_text_classifier(df, n_features=NF, iters=3, lr=0.5)
    b = train_text_classifier(
        df.repartition(13), n_features=NF, iters=3, lr=0.5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tokenless_doc_scores_via_intercept(spark):
    df = spark.createDataFrame(
        [(0, "aa bb", 1), (1, "...", 0), (2, "", 0)],
        "doc_id long, text string, label long",
    )
    w = train_text_classifier(df, n_features=NF, iters=2, lr=0.5)
    scored = score_text_classifier(df, w, n_features=NF)
    assert scored.count() == 3  # punctuation-only + empty still scored


def test_param_validation(spark, two_vocab):
    _rows, df = two_vocab
    with pytest.raises(ValueError, match="iters"):
        train_text_classifier(df, iters=0)
    with pytest.raises(ValueError, match="lr"):
        train_text_classifier(df, lr=0.0)
    empty = df.where("doc_id < 0")
    with pytest.raises(ValueError, match="empty"):
        train_text_classifier(empty, n_features=NF)


def test_curate_cli_classifier_and_semdedup_stages(
    spark, tiny_corpus, tmp_path
):
    """End-to-end: --classifier-weights gates on the learned model and
    --semdedup drops embedding near-dups, both inside the curate CLI."""
    import contextlib
    import io
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.classifier import (
        classifier_filter,
        train_text_classifier,
    )
    from jobs.curate import main as curate_main

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    tiny_corpus.write.parquet(inp)

    # train a tiny model: positives = docs containing w00000
    labeled = tiny_corpus.select(
        "doc_id", "text",
        F.col("text").contains("w00000").cast("int").alias("label"),
    )
    weights = train_text_classifier(labeled, iters=3)
    wdir = str(tmp_path / "weights")
    weights.write.parquet(wdir)

    # embeddings: vec_id == doc_id; plant one duplicate direction so
    # semdedup drops the higher doc_id
    rng = np.random.default_rng(11)
    ids = [r["doc_id"] for r in tiny_corpus.select("doc_id").collect()]
    vecs = {i: [float(x) for x in rng.standard_normal(8)] for i in ids}
    lo, hi = sorted(ids)[0], sorted(ids)[-1]
    vecs[hi] = [2.0 * x for x in vecs[lo]]
    edir = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    ).write.parquet(edir)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate_main([
            "--input", inp, "--output", out,
            "--min-tokens", "1", "--min-quality", "0.0",
            "--langs", "en,es,und",
            "--classifier-weights", wdir,
            "--classifier-min-prob", "0.5",
            "--semdedup", edir,
            "--semdedup-threshold", "0.999",
        ])
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    got = spark.read.parquet(out)
    assert got.count() == report["docs_out"] >= 1
    kept = {r["doc_id"] for r in got.select("doc_id").collect()}
    # the planted near-dup (higher id of the pair) is gone
    assert hi not in kept
    # every kept doc passes the classifier gate (replay directly)
    gate = {
        r["doc_id"]
        for r in classifier_filter(
            tiny_corpus.select("doc_id", "text"), weights, 0.5
        ).collect()
    }
    assert kept <= gate
