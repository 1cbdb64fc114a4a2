"""search_topk_batch: one pass over the index for a whole query set,
bit-identical per query to the single-query serving paths."""

import pytest

from hadoop_search_engine_spark.corpus import SYNONYMS, reference_queries
from hadoop_search_engine_spark.operators.query_exec import (
    search_topk,
    search_topk_batch,
)


def _by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_batch_bit_identical_to_per_query(tiny_index, serving):
    qs = {f"q{i}": q["query_text"] for i, q in enumerate(reference_queries()[:12])}
    got = _by_query(
        search_topk_batch(tiny_index, qs, k=10, synonyms=SYNONYMS, serving=serving)
    )
    for qid, text in qs.items():
        want = [
            (r["doc_id"], r["score"])
            for r in search_topk(
                tiny_index, text, k=10, synonyms=SYNONYMS, serving=serving
            ).collect()
        ]
        assert got.get(qid, []) == want, f"{qid}: {text!r}"


@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_batch_and_mode_matches_per_query(tiny_index, serving):
    qs = {
        "both": "needle7 w00000",
        "absent_term": "needle7 zzzznotaword",  # conjunctive -> no rows
        "single": "needle3",
    }
    got = _by_query(
        search_topk_batch(tiny_index, qs, k=10, mode="and", serving=serving)
    )
    assert "absent_term" not in got
    for qid in ("both", "single"):
        want = [
            (r["doc_id"], r["score"])
            for r in search_topk(
                tiny_index, qs[qid], k=10, mode="and", serving=serving
            ).collect()
        ]
        assert got.get(qid, []) == want, qid


def test_batch_empty_and_absent_queries(tiny_index):
    out = search_topk_batch(
        tiny_index, {"a": "", "b": "   ", "c": "zzzz qqqq", "d": "!!??"}, k=5
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score"]


def test_batch_shared_head_term_decode(tiny_index):
    # every query shares the head term: the decode cache is exercised
    # (shared partial across queries) and results still match
    qs = {f"q{i}": f"w0000{i % 3} needle7" for i in range(6)}
    got = _by_query(search_topk_batch(tiny_index, qs, k=5))
    for qid, text in qs.items():
        want = [
            (r["doc_id"], r["score"])
            for r in search_topk(tiny_index, text, k=5).collect()
        ]
        assert got.get(qid, []) == want, qid


def test_batch_respects_tombstones(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path / "batch_tomb")
    build_index(spark, tiny_corpus, out, num_shards=4, n_buckets=8, block_size=16)
    ix = Index.load(spark, out)
    top = [r["doc_id"] for r in search_topk(ix, "needle7", k=3).collect()]
    delete_docs(ix, [top[0]])
    ix = Index.load(spark, out)
    got = _by_query(search_topk_batch(ix, {"q": "needle7"}, k=10))
    want = [
        (r["doc_id"], r["score"])
        for r in search_topk(ix, "needle7", k=10).collect()
    ]
    assert top[0] not in [d for d, _ in got.get("q", [])]
    assert got.get("q", []) == want
