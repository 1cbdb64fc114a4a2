"""IVF ANN: deterministic training, pruned search, recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    ivf_train,
)

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF01}/embeddings.parquet").persist()
    df.count()
    return df


def test_ivf_train_deterministic(spark, emb):
    c1 = ivf_train(emb, n_centroids=8, n_iters=2)
    c2 = ivf_train(emb, n_centroids=8, n_iters=2)
    assert np.allclose(c1, c2)
    assert c1.shape[0] == 8


def test_ivf_topk_recall_vs_bruteforce(spark, emb):
    centroids = ivf_train(emb, n_centroids=8, n_iters=2)
    q = emb.where(F.col("vec_id") == 3).select("embedding").first()[0]
    exact = [r["vec_id"] for r in cosine_topk(emb, list(q), k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, list(q), centroids, k=10, n_probe=4).collect()]
    # self-hit always present, recall@10 over half with 4/8 probes
    assert 3 in approx
    recall = len(set(exact) & set(approx)) / 10.0
    assert recall >= 0.5, f"recall {recall} too low: {exact} vs {approx}"


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    centroids = ivf_train(emb, n_centroids=4, n_iters=1)
    q = emb.where(F.col("vec_id") == 7).select("embedding").first()[0]
    exact = cosine_topk(emb, list(q), k=5).collect()
    full = ivf_topk(emb, list(q), centroids, k=5, n_probe=4).collect()
    assert [(r["vec_id"], r["cosine"]) for r in exact] == [
        (r["vec_id"], r["cosine"]) for r in full
    ]


def test_ivfpq_coarse_trainer_seed_guard(spark):
    """_ivf_train_raw raises (like pq_train) when the corpus has fewer
    vectors than n_centroids instead of silently under-seeding."""
    import pytest

    from hadoop_search_engine_spark.operators.similarity import _ivf_train_raw

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="n_centroids"):
        _ivf_train_raw(emb, 8, 1, "vec_id", "embedding")
