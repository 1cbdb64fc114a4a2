"""Index aliases: atomic name → generation indirection, single and
federated serving, swap semantics."""

from __future__ import annotations

import os

import pytest

from hadoop_search_engine_spark.operators import aliases as A


def test_registry_crud_and_atomicity(tmp_path, tiny_index):
    reg = str(tmp_path / "reg")
    idx_dir = tiny_index.out_dir
    assert A.list_aliases(reg) == {}
    assert A.set_alias(reg, "live", idx_dir) == []
    assert A.resolve_alias(reg, "live") == [idx_dir]
    # swap returns the prior generation
    assert A.set_alias(reg, "live", [idx_dir]) == [idx_dir]
    assert A.list_aliases(reg) == {"live": [idx_dir]}
    # no torn temp file left behind
    assert os.listdir(reg) == [A.ALIASES_FILE]
    assert A.remove_alias(reg, "live") == [idx_dir]
    with pytest.raises(KeyError, match="unknown alias"):
        A.resolve_alias(reg, "live")
    with pytest.raises(KeyError, match="unknown alias"):
        A.remove_alias(reg, "live")


def test_set_alias_refuses_dangling_target(tmp_path):
    reg = str(tmp_path / "reg")
    with pytest.raises(ValueError, match="not a committed index"):
        A.set_alias(reg, "live", str(tmp_path / "nope"))
    assert A.list_aliases(reg) == {}  # registry untouched on failure
    with pytest.raises(ValueError, match="at least one"):
        A.set_alias(reg, "live", [])


def test_single_alias_search_matches_direct(tmp_path, spark, tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    reg = str(tmp_path / "reg")
    A.set_alias(reg, "live", tiny_index.out_dir)
    got = A.search_alias(spark, reg, "live", "w00000 w00017", k=8).collect()
    want = search_topk(tiny_index, "w00000 w00017", k=8).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    idx = A.load_alias(spark, reg, "live")
    assert idx.out_dir == tiny_index.out_dir


def test_multi_alias_serves_federated(tmp_path, spark, tiny_corpus):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk_segments,
    )

    half = 100
    span = 512
    d_a, d_b = str(tmp_path / "segA"), str(tmp_path / "segB")
    build_index(spark, tiny_corpus.where(F.col("doc_id") < half)
                .select("doc_id", "text"), d_a, shard_span=span, n_buckets=4)
    build_index(
        spark,
        tiny_corpus.where(F.col("doc_id") >= half)
        .withColumn("doc_id", F.col("doc_id") - half)
        .select("doc_id", "text"),
        d_b, shard_span=span, n_buckets=4,
    )
    reg = str(tmp_path / "reg")
    A.set_alias(reg, "all", [d_a, d_b])
    loaded = A.load_alias(spark, reg, "all")
    assert isinstance(loaded, list) and len(loaded) == 2
    got = A.search_alias(spark, reg, "all", "w00000 w00017", k=8).collect()
    want = search_topk_segments(
        [Index.load(spark, d_a), Index.load(spark, d_b)],
        "w00000 w00017", k=8,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 8
