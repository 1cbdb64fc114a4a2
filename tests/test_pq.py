"""Product quantization: trainer determinism, exact reconstruction on
codeword-coincident data, ADC recall vs exact cosine."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_search_engine_spark.operators.similarity import (
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_train,
)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


def _emb_df(spark, vecs, n_partitions=4):
    rows = [(i, list(map(float, v))) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(n_partitions)


def _rng_vecs(n, dim, n_clusters=8, spread=0.05, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    out = []
    for i in range(n):
        c = centers[i % n_clusters]
        out.append(_unit(c + spread * rng.randn(dim)))
    return out


def test_pq_shapes_and_validation(spark):
    emb = _emb_df(spark, _rng_vecs(40, 16))
    cb = pq_train(emb, m=4, nbits=3, n_iters=1)
    assert cb.shape == (4, 8, 4)
    enc = pq_encode(emb, cb)
    rows = enc.collect()
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["codes"])
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=5)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(enc, cb, [0.0] * 7)


def test_pq_exact_on_codeword_coincident_data(spark):
    # exactly k distinct unit vectors: k-means with k codes converges
    # onto the points, ADC reconstructs every dot product exactly,
    # and each vector's own query returns itself first (cos <= 1).
    vecs = _rng_vecs(8, 16, n_clusters=8, spread=0.0)
    emb = _emb_df(spark, vecs, n_partitions=2)
    cb = pq_train(emb, m=4, nbits=3, n_iters=2)
    enc = pq_encode(emb, cb).persist()
    for i in (0, 3, 7):
        top = pq_topk(enc, cb, vecs[i], k=1).collect()
        assert top[0]["vec_id"] == i
        assert top[0]["score"] == pytest.approx(1.0, abs=2e-6)


def test_pq_train_partition_invariant(spark):
    vecs = _rng_vecs(60, 16)
    cb2 = pq_train(_emb_df(spark, vecs, 2), m=4, nbits=3, n_iters=2)
    cb8 = pq_train(_emb_df(spark, vecs, 8), m=4, nbits=3, n_iters=2)
    assert np.array_equal(cb2, cb8)


def test_pq_recall_vs_exact_cosine(spark):
    vecs = _rng_vecs(200, 32, n_clusters=8, spread=0.05)
    emb = _emb_df(spark, vecs).persist()
    q = vecs[0]
    exact = [r["vec_id"] for r in
             cosine_topk(emb, q, k=10).collect()]
    cb = pq_train(emb, m=8, nbits=3, n_iters=2)
    enc = pq_encode(emb, cb)
    approx = [r["vec_id"] for r in pq_topk(enc, cb, q, k=10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.6  # tight clusters: PQ keeps the neighborhood


def test_pq_table_roundtrip(spark, tmp_path):
    from hadoop_search_engine_spark.operators.similarity import (
        pq_topk_table,
        write_pq_table,
    )

    vecs = _rng_vecs(60, 16)
    emb = _emb_df(spark, vecs)
    cb = pq_train(emb, m=4, nbits=3, n_iters=2)
    d = str(tmp_path / "pq")
    write_pq_table(emb, cb, d)
    want = pq_topk(pq_encode(emb, cb), cb, vecs[3], k=5).collect()
    got = pq_topk_table(spark, d, vecs[3], k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# ------------------------------------------------------------- IVF-PQ


def test_ivfpq_recall_and_prune(spark):
    from hadoop_search_engine_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    vecs = _rng_vecs(200, 32, n_clusters=8, spread=0.05)
    emb = _emb_df(spark, vecs).persist()
    cents, cbs = ivfpq_train(emb, n_centroids=8, m=8, nbits=3)
    enc = ivfpq_encode(emb, cents, cbs).persist()
    assert enc.columns == ["vec_id", "cluster", "codes"]
    q = vecs[0]
    # within a tight cluster (spread 0.05) the exact top-10 margins sit
    # BELOW the PQ reconstruction resolution (~0.03 with 3-bit codes),
    # so the honest recall contract is cluster-level: every returned
    # neighbor must come from the query's true cluster (ids = 0 mod 8),
    # at every n_probe, and the probe prune must not starve k.
    true_cluster = {i for i in range(200) if i % 8 == 0}
    for n_probe in (2, 8):
        approx = [r["vec_id"] for r in
                  ivfpq_topk(enc, cents, cbs, q, k=10, n_probe=n_probe)
                  .collect()]
        assert len(approx) == 10
        assert sum(1 for i in approx if i in true_cluster) >= 9
    # and the ADC score approximates the true cosine to recon error
    top = ivfpq_topk(enc, cents, cbs, q, k=1, n_probe=8).collect()[0]
    import numpy as _np

    true_cos = float(_np.dot(q, vecs[top["vec_id"]]))
    assert abs(top["score"] - true_cos) < 0.1


def test_ivfpq_exact_on_centroid_coincident_data(spark):
    from hadoop_search_engine_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    # vectors == the 8 coarse centroids -> residuals are all zero,
    # reconstruction is exact, each vector's own query wins
    vecs = _rng_vecs(8, 16, n_clusters=8, spread=0.0)
    emb = _emb_df(spark, vecs, n_partitions=2)
    cents, cbs = ivfpq_train(emb, n_centroids=8, m=4, nbits=3)
    enc = ivfpq_encode(emb, cents, cbs)
    for i in (0, 5):
        top = ivfpq_topk(enc, cents, cbs, vecs[i], k=1, n_probe=8).collect()
        assert top[0]["vec_id"] == i
        assert top[0]["score"] == pytest.approx(1.0, abs=2e-6)


def test_ivfpq_train_partition_invariant(spark):
    from hadoop_search_engine_spark.operators.similarity import ivfpq_train

    vecs = _rng_vecs(60, 16)
    c2, b2 = ivfpq_train(_emb_df(spark, vecs, 2), n_centroids=4, m=4, nbits=2)
    c8, b8 = ivfpq_train(_emb_df(spark, vecs, 8), n_centroids=4, m=4, nbits=2)
    assert np.array_equal(c2, c8) and np.array_equal(b2, b8)
