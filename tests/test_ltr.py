"""Learning-to-rank: feature extraction, deterministic training, and
the learned reranker actually beating BM25 when relevance follows a
metadata feature."""

from __future__ import annotations

import os
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.ltr import (
    ltr_features,
    ltr_rerank,
    ltr_score_col,
    train_ltr,
)


@pytest.fixture(scope="module")
def ltr_setup(spark, tmp_path_factory):
    """Corpus where the terms match many docs but TRUE relevance is
    'quality = 1' (a metadata feature BM25 cannot see)."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    rows = []
    for i in range(120):
        # every doc matches 'alpha'; high-quality docs get quality=1
        # and only a MILD extra tf, so bm25 alone ranks them poorly
        quality = 1 if i % 4 == 0 else 0
        filler = " ".join(f"w{(i * 7 + j) % 40:03d}" for j in range(20))
        text = ("alpha " * (2 + (i % 3))) + filler
        rows.append((i, text.strip(), quality, len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, quality int, n_chars int"
    )
    d = str(tmp_path_factory.mktemp("ltr") / "idx")
    build_index(spark, docs.select("doc_id", "text"), d, n_buckets=4)
    idx = Index.load(spark, d)
    queries = {"q1": "alpha", "q2": "alpha w007"}
    qrels = spark.createDataFrame(
        [(q, i, 1) for q in queries for i in range(0, 120, 4)],
        "query_id string, doc_id long, rel int",
    )
    return idx, docs, queries, qrels


def test_ltr_features_shape(ltr_setup, spark):
    idx, docs, queries, _ = ltr_setup
    feats = ltr_features(
        idx, queries, documents=docs, doc_feature_cols=("quality",)
    )
    assert set(feats.columns) == {
        "query_id", "doc_id", "bm25", "n_query_terms", "quality",
    }
    # q1 matches every doc (all contain 'alpha')
    assert feats.where("query_id = 'q1'").count() == 120
    with pytest.raises(ValueError, match="lacks feature columns"):
        ltr_features(idx, queries, documents=docs,
                     doc_feature_cols=("nope",))
    with pytest.raises(ValueError, match="needs documents"):
        ltr_features(idx, queries, doc_feature_cols=("quality",))


def test_ltr_training_learns_quality_and_is_deterministic(ltr_setup, spark):
    from hadoop_search_engine_spark.operators.evaluate import evaluate_ranking

    idx, docs, queries, qrels = ltr_setup
    feats = ltr_features(
        idx, queries, documents=docs, doc_feature_cols=("quality",)
    ).persist()
    cols = ("bm25", "quality")
    m1 = train_ltr(feats, qrels, cols)
    m2 = train_ltr(feats.repartition(7), qrels, cols)
    assert m1 == m2  # deterministic incl. under repartitioning
    # the quality weight dominates: it's the true relevance signal
    wq = dict(zip(m1["feature_cols"], m1["weights"]))
    assert wq["quality"] > abs(wq["bm25"])

    reranked = ltr_rerank(feats, m1, k=10)
    ltr_ndcg = (
        evaluate_ranking(reranked.select("query_id", "doc_id", "rank"),
                         qrels, k=10)
        .agg(F.avg("ndcg")).collect()[0][0]
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc("doc_id"))
    bm25_run = (
        feats.withColumn("rank", F.row_number().over(w))
        .where("rank <= 10").select("query_id", "doc_id", "rank")
    )
    bm25_ndcg = (
        evaluate_ranking(bm25_run, qrels, k=10)
        .agg(F.avg("ndcg")).collect()[0][0]
    )
    assert ltr_ndcg > bm25_ndcg + 0.2  # the model found the signal
    # top-10 of every query is all quality docs
    top = ltr_rerank(feats, m1, k=10).collect()
    assert all(r["doc_id"] % 4 == 0 for r in top)


def test_ltr_score_col_is_pure_expression(ltr_setup, spark):
    idx, docs, queries, qrels = ltr_setup
    feats = ltr_features(
        idx, queries, documents=docs, doc_feature_cols=("quality",)
    )
    model = train_ltr(feats, qrels, ("bm25", "quality"), n_iters=10)
    plan = feats.select(ltr_score_col(model).alias("s"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # scoring is JVM-only


def test_ltr_cli_train_and_rerank(ltr_setup, spark, tmp_path, capsys):
    import json

    from jobs.ltr import main as ltr_main

    idx, docs, queries, qrels = ltr_setup
    qfile = str(tmp_path / "q.json")
    with open(qfile, "w") as f:
        json.dump(queries, f)
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_path)
    qrels_path = str(tmp_path / "qrels.parquet")
    qrels.write.parquet(qrels_path)
    model_path = str(tmp_path / "model.json")
    run_path = str(tmp_path / "run.parquet")

    ltr_main([
        "--index", idx.out_dir, "--queries", qfile,
        "--documents", docs_path, "--doc-features", "quality",
        "--qrels", qrels_path, "--train-out", model_path,
        "--rerank-out", run_path, "--k", "10",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ndcg_ltr"] > out["ndcg_bm25"]
    assert os.path.exists(model_path)
    run = spark.read.parquet(run_path)
    assert set(run.columns) == {"query_id", "doc_id", "ltr_score", "rank"}
    assert run.where("rank <= 10").count() == run.count()
