import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators import similarity

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF01}/embeddings.parquet").persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, q, k):
    q = np.asarray(q, dtype=np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos = np.round(cos, 6)
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def test_bruteforce_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    want = _numpy_topk(ids, mat, q, 10)
    got = [
        (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_lsh_topk_recall(emb, emb_np):
    ids, mat = emb_np
    q = mat[7].tolist()
    exact = {d for d, _ in _numpy_topk(ids, mat, q, 10)}
    approx = {
        r["vec_id"]
        for r in similarity.lsh_bucket_topk(
            emb, q, k=10, n_planes=6, n_probe_bits=2
        ).collect()
    }
    # recall@10 >= 0.5 with 6 planes / probe 2 on 500 vectors
    assert len(exact & approx) >= 5


def test_lsh_self_hit(emb, emb_np):
    ids, mat = emb_np
    q = mat[42].tolist()
    got = similarity.lsh_bucket_topk(emb, q, k=1, n_planes=8, n_probe_bits=0).collect()
    # the query vector itself is always in its own bucket
    assert got[0]["vec_id"] == 42


def test_cosine_dup_pairs_vs_exact(spark):
    # construct a small set with known near-dups
    base = np.array([1.0, 2.0, 3.0, 4.0])
    rows = [
        (1, (base / np.linalg.norm(base)).tolist()),
        (2, (base * 2.0 / np.linalg.norm(base * 2)).tolist()),  # same direction
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, (base + np.array([0.01, 0, 0, 0])).tolist()),  # near
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["a"], r["b"])
        for r in similarity.cosine_dup_pairs_exact(df, threshold=0.999).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in similarity.cosine_dup_pairs(df, threshold=0.999, n_planes=4).collect()
    }
    assert (1, 2) in exact and (1, 4) in exact
    assert lsh <= exact  # LSH returns only verified true pairs
    assert (1, 2) in lsh  # identical direction always shares every bucket


def test_int8_quantization_recall_and_exactness(spark):
    import numpy as np

    from hadoop_search_engine_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_int8,
        quantize_embeddings,
    )

    rng = np.arange(1, 9, dtype=np.float64)
    rows = [
        (i, [float(np.sin(x * (i + 1) * 0.37)) for x in rng])
        for i in range(60)
    ] + [(60, [0.0] * 8)]  # zero vector must survive quantization
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qt = quantize_embeddings(emb).persist()
    got = {r["vec_id"]: (list(r["qvec"]), r["scale"])
           for r in qt.collect()}
    # quantized values in [-127, 127]; max component hits ±127 exactly
    for i, (q, s) in got.items():
        assert all(-127 <= x <= 127 for x in q)
        if i != 60:
            assert max(abs(x) for x in q) == 127
    assert got[60][0] == [0] * 8 and got[60][1] == 0.0

    qvec = rows[3][1]
    exact = [r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()]
    quant = [r["vec_id"]
             for r in cosine_topk_int8(qt, qvec, k=10).collect()]
    assert quant[0] == 3  # the vector itself still wins
    # int8 recall@10 vs float >= 0.8 on this spread
    assert len(set(exact) & set(quant)) >= 8
    # the quantized cosine of the self-match is ~1
    top = cosine_topk_int8(qt, qvec, k=1).collect()[0]
    assert abs(top["cosine"] - 1.0) < 5e-3


# ------------------------------------------------------------ semdedup


def test_semdedup_drops_higher_id_near_dups(spark):
    base = np.array([1.0, 2.0, 3.0, 4.0])
    rows = [
        (1, (base / np.linalg.norm(base)).tolist()),
        (2, (base * 2.0 / np.linalg.norm(base * 2)).tolist()),  # dup of 1
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, (base + np.array([0.01, 0, 0, 0])).tolist()),       # dup of 1
        (5, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for method in ("exact", "lsh"):
        kept = sorted(
            r["vec_id"]
            for r in similarity.semdedup(df, threshold=0.999,
                                         method=method).collect()
        )
        # 2 and 4 both have the lower-id near-dup 1; unique vectors stay
        assert kept == [1, 3, 5], (method, kept)
    with pytest.raises(ValueError, match="method"):
        similarity.semdedup(df, method="kmeans")


def test_semdedup_lsh_equals_exact_on_real_vectors(spark, emb):
    # the sf0.01 embeddings have no natural near-dups (verified in
    # the oracle), so plant some: scaled copies of vectors 3/7/11
    # under fresh ids — same direction, cosine exactly 1, and they
    # share every LSH sign bucket with their originals
    src = emb.where(F.col("vec_id") < 100)
    dups = (
        src.where(F.col("vec_id").isin([3, 7, 11]))
        .select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        )
    )
    df = src.select("vec_id", "embedding").unionByName(dups)
    a = {r["vec_id"]
         for r in similarity.semdedup(df, threshold=0.999,
                                      method="exact").collect()}
    b = {r["vec_id"]
         for r in similarity.semdedup(df, threshold=0.999,
                                      method="lsh").collect()}
    assert a == b
    assert a == {r["vec_id"] for r in src.collect()}  # copies dropped


def test_semdedup_keeps_all_when_no_dups(spark):
    rows = [(i, [float(i == j) for j in range(6)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert similarity.semdedup(df, threshold=0.9).count() == 6


def test_ann_cli_build_and_query_all_methods(spark, tmp_path, capsys):
    """jobs/ann.py: build + query every persisted method; the planted
    same-direction duplicate of vec 0 must surface for each."""
    import json

    import numpy as np

    from jobs.ann import main as ann_main

    rng = np.random.RandomState(3)
    vecs = [
        (rng.randn(16) / np.linalg.norm(rng.randn(16))).tolist()
        for _ in range(64)
    ]
    vecs = [list(np.asarray(v) / np.linalg.norm(v)) for v in vecs]
    vecs[7] = vecs[0]  # exact duplicate direction
    emb_path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).write.parquet(emb_path)

    def run(argv):
        ann_main(argv)
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    exact = run(["--embeddings", emb_path, "--method", "exact",
                 "--query-id", "0", "--k", "3"])
    assert {h[0] for h in exact["hits"][:2]} == {0, 7}

    for method in ("lsh", "ivf", "pq", "ivfpq"):
        d = str(tmp_path / f"t_{method}")
        built = run(["--embeddings", emb_path, "--build", method,
                     "--output", d, "--n-centroids", "4", "--m", "4",
                     "--nbits", "3"])
        assert built == {"built": method, "output": d}
        got = run(["--table", d, "--embeddings", emb_path,
                   "--query-id", "0", "--k", "3", "--n-probe", "2"])
        assert got["method"] == method
        assert {h[0] for h in got["hits"][:2]} == {0, 7}, method
