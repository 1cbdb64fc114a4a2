"""term_vectors (ES _termvectors per-doc surface): (doc_id, term, tf,
positions) decoded shard-locally from the inverted index, checked
against a pure-Python tokenize of the same documents."""

from __future__ import annotations

from collections import Counter

import pytest

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    term_vectors,
)

ROWS = [
    (0, "the quick brown fox the quick"),
    (1, "spark table spark spark"),
    (2, "one token"),
    (3, ""),                      # empty doc: no vectors
    (4, "far away doc"),
]


@pytest.fixture(scope="module")
def tv_index(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("tvix") / "ix")
    build_index(spark, docs, out, num_shards=2, n_buckets=4, block_size=4,
                positions=True)
    return Index.load(spark, out)


def _want(doc_ids):
    want = {}
    for did, text in ROWS:
        if did not in doc_ids:
            continue
        toks = tokenize(text)
        for term, tf in Counter(toks).items():
            want[(did, term)] = (
                tf, [i for i, t in enumerate(toks) if t == term]
            )
    return want


def test_vectors_match_tokenize(tv_index):
    got = {
        (r["doc_id"], r["term"]): (r["tf"], list(r["positions"]))
        for r in term_vectors(tv_index, [0, 1, 2, 3, 4]).collect()
    }
    assert got == _want({0, 1, 2, 3, 4})


def test_subset_and_shard_pruning(tv_index):
    # only doc 4's rows come back; absent/unknown ids yield nothing
    got = {
        (r["doc_id"], r["term"])
        for r in term_vectors(tv_index, [4, 999999]).collect()
    }
    assert got == {(4, "far"), (4, "away"), (4, "doc")}
    assert term_vectors(tv_index, []).count() == 0


def test_positions_flag(tv_index, spark, tmp_path):
    nopos = term_vectors(tv_index, [0], positions=False)
    assert nopos.columns == ["doc_id", "term", "tf"]
    plain_dir = str(tmp_path / "plain")
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    build_index(spark, docs, plain_dir, num_shards=2, n_buckets=4,
                block_size=4)
    plain = Index.load(spark, plain_dir)
    assert term_vectors(plain, [1]).columns == ["doc_id", "term", "tf"]
    with pytest.raises(ValueError, match="positions"):
        term_vectors(plain, [1], positions=True)


def test_tombstoned_doc_yields_nothing(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_maint import delete_docs

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path / "tvdel")
    build_index(spark, docs, out, num_shards=2, n_buckets=4, block_size=4,
                positions=True)
    ix = Index.load(spark, out)
    delete_docs(ix, [1])
    got = {r["doc_id"] for r in term_vectors(ix, [0, 1]).collect()}
    assert got == {0}


def test_analyzed_index_vectors_are_analyzed(spark, tmp_path):
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
        analyze,
    )

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path / "tvana")
    build_index(spark, docs, out, num_shards=2, n_buckets=4, block_size=4,
                positions=True, stopwords=ENGLISH_STOPWORDS, stem="s")
    ix = Index.load(spark, out)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], list(r["positions"]))
        for r in term_vectors(ix, [0]).collect()
    }
    toks = analyze(ROWS[0][1], ENGLISH_STOPWORDS, "s")
    want = {
        (0, term): (tf, [i for i, t in enumerate(toks) if t == term])
        for term, tf in Counter(toks).items()
    }
    assert got == want and "the" not in {t for _, t in got}
