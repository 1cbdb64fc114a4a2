"""ES pinned query (pins first, in order, then organic minus pins)
and the regexp / pinned DSL wirings. The DSL adds no ranking code, so
identity with the direct calls is the contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.dsl import DslError, search_dsl
from hadoop_search_engine_spark.operators.query_exec import (
    PINNED_SCORE_BASE,
    pinned_search,
    regexp_search,
    search_topk,
)

Q = "w00000 w00017"


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_pinned_docs_come_first_in_listed_order(tiny_index):
    organic = _ids(search_topk(tiny_index, Q, k=30))
    # pin two docs that are NOT the organic top-2, in reverse-id order
    pins = [organic[-1], organic[2]]
    got = pinned_search(tiny_index, pins, Q, k=10)
    rows = got.collect()
    assert [r["doc_id"] for r in rows[:2]] == pins
    assert rows[0]["score"] == PINNED_SCORE_BASE
    assert rows[1]["score"] == PINNED_SCORE_BASE - 1
    # organic tail: the plain ranking minus the pins
    want_tail = [d for d in organic if d not in pins][:8]
    assert [r["doc_id"] for r in rows[2:]] == want_tail


def test_pinned_includes_non_matching_docs(tiny_index, tiny_corpus):
    # a doc that does NOT match the query still surfaces when pinned
    # (rare tail term so non-matching docs exist in the 200-doc corpus)
    q = "w00200"
    matching = set(_ids(search_topk(tiny_index, q, k=10**6)))
    non_match = (
        tiny_corpus.where(~F.col("doc_id").isin(list(matching)))
        .select("doc_id").first()
    )
    assert non_match is not None
    got = _ids(pinned_search(tiny_index, [non_match["doc_id"]], q, k=5))
    assert got[0] == non_match["doc_id"]


def test_pinned_skips_unknown_and_dedupes(tiny_index):
    organic = _ids(search_topk(tiny_index, Q, k=10))
    p = organic[3]
    got = _ids(pinned_search(tiny_index, [10**12, p, p], Q, k=10))
    assert got[0] == p
    assert 10**12 not in got
    assert got.count(p) == 1
    assert len(got) == 10


def test_pinned_empty_ids_is_plain_search(tiny_index):
    assert _ids(pinned_search(tiny_index, [], Q, k=10)) == _ids(
        search_topk(tiny_index, Q, k=10)
    )


def test_pinned_respects_tombstones(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path / "pidx")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=2, n_buckets=4)
    ix = Index.load(spark, out)
    victim = _ids(search_topk(ix, Q, k=1))[0]
    delete_docs(ix, [victim])
    ix = Index.load(spark, out)
    got = _ids(pinned_search(ix, [victim], Q, k=10))
    assert victim not in got


def test_dsl_pinned_identity_and_validation(tiny_index):
    organic = _ids(search_topk(tiny_index, Q, k=10))
    pins = [organic[4], organic[1]]
    got = search_dsl(
        tiny_index,
        {"query": {"pinned": {"ids": pins,
                              "organic": {"match": {"text": Q}}}},
         "size": 8},
    )
    want = pinned_search(tiny_index, pins, Q, k=8)
    assert got.hits.collect() == want.collect()
    with pytest.raises(DslError, match="ids"):
        search_dsl(tiny_index,
                   {"query": {"pinned": {"ids": [],
                                         "organic": {"match":
                                                     {"text": Q}}}}})


def test_dsl_regexp_identity(tiny_index):
    got = search_dsl(
        tiny_index,
        {"query": {"regexp": {"text": {"value": "w0000(0|7)",
                                       "max_expansions": 5}}},
         "size": 12},
    )
    want = regexp_search(tiny_index, "w0000(0|7)", k=12, max_expansions=5)
    assert got.hits.collect() == want.collect()
    assert got.hits.count() > 0


def test_msearch_matches_single_searches(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.dsl import msearch_dsl
    from pyspark.sql import functions as F

    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    bodies = [
        {"query": {"match": {"text": Q}}, "size": 5},
        {"query": {"term": {"text": "w00007"}}, "size": 3},
        {"query": {"match": {"text": Q}},
         "aggs": {"langs": {"terms": {"field": "lang"}}}},
    ]
    got = msearch_dsl(tiny_index, bodies, documents=docs)
    assert len(got) == 3
    for body, r in zip(bodies, got):
        single = search_dsl(tiny_index, body, documents=docs)
        assert r.hits.collect() == single.hits.collect()
        for k in single.aggs:
            assert r.aggs[k].collect() == single.aggs[k].collect()
    with pytest.raises(DslError, match="non-empty"):
        msearch_dsl(tiny_index, [])


def test_collapse_inner_hits_expands_page_groups(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        collapse_inner_hits,
        scored_docs,
    )

    docs = tiny_corpus
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "collapse": {"field": "lang",
                      "inner_hits": {"name": "same_lang", "size": 2}},
         "size": 3},
        documents=docs,
    )
    page = got.hits.collect()
    inner = got.inner_hits["same_lang"].collect()
    page_keys = {r["lang"] for r in page if r["lang"] is not None}
    assert {r["lang"] for r in inner} == page_keys
    by_key = {}
    for r in inner:
        by_key.setdefault(r["lang"], []).append(r)
    sc = {r["doc_id"]: r["score"]
          for r in scored_docs(tiny_index, Q).collect()}
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    for key, rows in by_key.items():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2
        # rank-1 inner hit IS the collapsed page's doc for that key
        page_doc = next(r for r in page if r["lang"] == key)
        assert rows[0]["doc_id"] == page_doc["doc_id"]
        # replay: the group's true top-2 from the full match set
        members = sorted(
            ((-(sc[d]), d) for d, l in langs.items()
             if l == key and d in sc),
        )[:2]
        assert [(r["doc_id"]) for r in rows] == [d for _s, d in members]
    # identity with the direct operator
    direct = collapse_inner_hits(
        got.hits, scored_docs(tiny_index, Q),
        docs.select("doc_id", "lang"), "lang", n=2)
    assert inner == direct.collect()


def test_search_template_renders_and_matches_direct(tiny_index):
    from hadoop_search_engine_spark.operators.dsl import (
        render_search_template,
        search_template,
    )

    src = {"query": {"match": {"text": "{{q}}"}},
           "size": "{{k}}",
           "aggs": {"langs": {"terms": {"field": "{{facet}}",
                                        "size": 2}}}}
    body = render_search_template(
        src, {"q": Q, "k": 4, "facet": "lang"})
    assert body == {"query": {"match": {"text": Q}}, "size": 4,
                    "aggs": {"langs": {"terms": {"field": "lang",
                                                 "size": 2}}}}
    # typed whole-string substitution: k stayed an int
    assert isinstance(body["size"], int)
    # embedded substitution stays text
    got = render_search_template(
        {"query": {"match": {"text": "{{a}} {{b}}"}}},
        {"a": "w00000", "b": "w00017"})
    assert got["query"]["match"]["text"] == Q
    with pytest.raises(DslError, match="no value"):
        render_search_template({"query": "{{missing}}"}, {})
    with pytest.raises(DslError, match="sections"):
        render_search_template(
            {"q": "{{#cond}}yes{{/cond}}"}, {"cond": True})
    # end-to-end identity
    r = search_template(
        tiny_index,
        {"query": {"match": {"text": "{{q}}"}}, "size": "{{k}}"},
        {"q": Q, "k": 5})
    direct = search_dsl(tiny_index,
                        {"query": {"match": {"text": Q}}, "size": 5})
    assert r.hits.collect() == direct.hits.collect()


def test_dsl_fields_and_track_total_hits(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import count_matches
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    docs = tiny_corpus
    r = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}}, "size": 5,
         "fields": ["lang", "url"], "track_total_hits": True},
        documents=docs,
    )
    rows = r.hits.collect()
    assert [x["doc_id"] for x in rows] == [
        x["doc_id"] for x in search_topk(tiny_index, Q, k=5).collect()
    ]
    meta = {x["doc_id"]: (x["lang"], x["url"]) for x in docs.collect()}
    for x in rows:
        assert (x["lang"], x["url"]) == meta[x["doc_id"]]
    assert r.total.collect()[0]["n_hits"] == count_matches(
        tiny_index, Q).collect()[0]["n_hits"]
    with pytest.raises(DslError, match="documents"):
        search_dsl(tiny_index,
                   {"query": {"match": {"text": Q}}, "fields": ["lang"]})
    with pytest.raises(DslError, match="already present"):
        search_dsl(tiny_index,
                   {"query": {"match": {"text": Q}},
                    "fields": ["doc_id"]}, documents=docs)
