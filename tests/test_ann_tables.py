"""Persisted ANN tables: partitionBy(bucket/cluster) + partition pruning.

Verifies the scale claim behind lsh_bucket_topk/ivf_topk is exercised,
not just documented: the probed-bucket IN-filter must appear as a
PartitionFilters entry on the parquet scan (file-listing-level pruning),
and the table variants must return the same results as the on-the-fly
variants.
"""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.where("vec_id = 0").select("embedding").first()[0])


def _partition_filters(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line
    # formatted-string fallback
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return next((ln for ln in s.splitlines() if "PartitionFilters" in ln), "")


def test_lsh_bucketed_table_prunes_and_matches(spark, emb, qvec, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "lsh_bucketed")
    planes = similarity.write_lsh_bucketed(emb, out, n_planes=6)
    assert planes.shape == (6, len(qvec))

    table_topk = similarity.lsh_bucket_topk_table(
        spark, out, qvec, k=10, n_planes=6, n_probe_bits=2
    )
    pf = _partition_filters(table_topk)
    # non-empty PartitionFilters on the bucket column (Spark prints the
    # IN-list as `bucket#N INSET v1, v2, ...`)
    assert "PartitionFilters: [bucket" in pf, f"no partition pruning: {pf}"

    fly = similarity.lsh_bucket_topk(emb, qvec, k=10, n_planes=6, n_probe_bits=2)
    assert [tuple(r) for r in table_topk.collect()] == [
        tuple(r) for r in fly.collect()
    ]
    # the query's own vector is its nearest neighbor
    assert table_topk.first()["vec_id"] == 0


def test_ivf_clustered_table_prunes_and_matches(spark, emb, qvec, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "ivf_clustered")
    centroids = similarity.ivf_train(emb, n_centroids=8, n_iters=2)
    similarity.write_ivf_clustered(emb, out, centroids)

    table_topk = similarity.ivf_topk_table(
        spark, out, qvec, centroids, k=10, n_probe=4
    )
    pf = _partition_filters(table_topk)
    assert "PartitionFilters: [cluster" in pf, f"no partition pruning: {pf}"

    fly = similarity.ivf_topk(emb, qvec, centroids, k=10, n_probe=4)
    assert [tuple(r) for r in table_topk.collect()] == [
        tuple(r) for r in fly.collect()
    ]


def test_bucket_udf_matches_bucket_semantics(spark, emb):
    """Vectorized matmul bucketing is deterministic and partition-
    invariant (same hyperplane family regardless of data layout)."""
    a, planes_a = similarity.add_lsh_buckets(emb, n_planes=6)
    b, planes_b = similarity.add_lsh_buckets(emb.repartition(7), n_planes=6)
    assert (planes_a == planes_b).all()
    ba = {r["vec_id"]: r["bucket"] for r in a.select("vec_id", "bucket").collect()}
    bb = {r["vec_id"]: r["bucket"] for r in b.select("vec_id", "bucket").collect()}
    assert ba == bb
    assert 0 <= min(ba.values()) and max(ba.values()) < (1 << 6)
