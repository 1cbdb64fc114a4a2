from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hadoop_search_engine_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hse-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """200-doc deterministic corpus with dense doc_ids (FIXTURES.md 'tiny')."""
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids

    docs = assign_doc_ids(gen_documents(spark, 200, n_partitions=4), num_partitions=4)
    docs = docs.select("doc_id", "url", "text", "lang").persist()
    docs.count()
    return docs


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle

    rows = tiny_corpus.select("doc_id", "text").collect()
    return BM25Oracle([(r["doc_id"], r["text"]) for r in rows])


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path_factory.mktemp("index") / "tiny")
    build_index(spark, tiny_corpus, out, num_shards=4, n_buckets=8, block_size=16)
    return Index.load(spark, out)
