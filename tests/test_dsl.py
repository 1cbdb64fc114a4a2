"""ES-style JSON DSL (operators/dsl.py): every clause must be
IDENTICAL to the direct engine call it compiles to — the DSL adds no
scoring code, so identity is the whole contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.boolean import search_topk_boolean
from hadoop_search_engine_spark.operators.dsl import (
    DslError,
    search_dsl,
)
from hadoop_search_engine_spark.operators.hybrid import function_score
from hadoop_search_engine_spark.operators.query_exec import (
    facet_counts,
    fuzzy_search_topk,
    matched_docs,
    phrase_search,
    prefix_search,
    search_topk,
    stats_facet,
    wildcard_search,
)

Q = "w00000 w00017"


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _same(a_df, b_df):
    return _pairs(a_df) == _pairs(b_df)


# ------------------------------------------------------- match family


def test_match_equals_search_topk(tiny_index):
    got = search_dsl(tiny_index, {"query": {"match": {"text": Q}}, "size": 7})
    assert _same(got.hits, search_topk(tiny_index, Q, k=7))


def test_match_operator_and_msm(tiny_index):
    got = search_dsl(tiny_index, {
        "query": {"match": {"text": {"query": Q, "operator": "and"}}},
    })
    assert _same(got.hits, search_topk(tiny_index, Q, k=10, mode="and"))
    got2 = search_dsl(tiny_index, {
        "query": {"match": {"text": {"query": Q + " w00001",
                                     "minimum_should_match": 2}}},
    })
    assert _same(got2.hits, search_topk(tiny_index, Q + " w00001", k=10,
                                        min_should_match=2))


def test_query_string_boosts(tiny_index):
    body = {"query": {"query_string": {"query": "w00000^2 w00017"}}}
    assert _same(search_dsl(tiny_index, body).hits,
                 search_topk(tiny_index, "w00000^2 w00017", k=10))


def test_term_and_terms(tiny_index):
    assert _same(
        search_dsl(tiny_index, {"query": {"term": {"text": "w00000"}}}).hits,
        search_topk(tiny_index, "w00000", k=10))
    assert _same(
        search_dsl(tiny_index,
                   {"query": {"terms": {"text": ["w00000", "w00017"]}}}).hits,
        search_topk(tiny_index, Q, k=10))


def test_similarity_through_dsl(tiny_index):
    body = {"query": {"match": {"text": Q}}, "similarity": "lm_dirichlet"}
    assert _same(search_dsl(tiny_index, body).hits,
                 search_topk(tiny_index, Q, k=10, similarity="lm_dirichlet"))


def test_search_after_pages(tiny_index):
    p1 = search_dsl(tiny_index, {"query": {"match": {"text": Q}}, "size": 5})
    last = _pairs(p1.hits)[-1]
    p2 = search_dsl(tiny_index, {"query": {"match": {"text": Q}},
                                 "size": 5, "search_after": list(last)})
    assert _pairs(p1.hits) + _pairs(p2.hits) == _pairs(
        search_topk(tiny_index, Q, k=10))


# ----------------------------------------------------- other variants


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path_factory.mktemp("dslpos") / "idx")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=4, n_buckets=8, block_size=16, positions=True)
    return Index.load(spark, out)


def test_match_phrase(pos_index, tiny_corpus):
    first_two = " ".join(
        tiny_corpus.select("text").first()["text"].split()[:2])
    body = {"query": {"match_phrase": {"text": first_two}}}
    assert _same(search_dsl(pos_index, body).hits,
                 phrase_search(pos_index, first_two, k=10))
    slopb = {"query": {"match_phrase": {"text": {"query": first_two,
                                                 "slop": 2}}}}
    assert _same(search_dsl(pos_index, slopb).hits,
                 phrase_search(pos_index, first_two, k=10, slop=2))


def test_prefix_wildcard_fuzzy(tiny_index):
    assert _same(
        search_dsl(tiny_index, {"query": {"prefix": {"text": "w0001"}}}).hits,
        prefix_search(tiny_index, "w0001", k=10))
    assert _same(
        search_dsl(tiny_index,
                   {"query": {"wildcard": {"text": "w*17"}}}).hits,
        wildcard_search(tiny_index, "w*17", k=10))
    assert _same(
        search_dsl(tiny_index, {"query": {"fuzzy": {"text": "w0001x"}}}).hits,
        fuzzy_search_topk(tiny_index, "w0001x", k=10))


def test_multi_match(spark, tiny_corpus, tmp_path_factory):
    from hadoop_search_engine_spark.operators.multifield import (
        build_multifield_index,
        multi_match,
    )

    out = str(tmp_path_factory.mktemp("dslmf") / "idx")
    mf = build_multifield_index(spark, tiny_corpus, out, {
        "title": F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " "),
        "body": F.array_join(
            F.slice(F.split(F.col("text"), " "), 9, 1 << 20), " "),
    }, num_shards=2, n_buckets=4)
    body = {"query": {"multi_match": {
        "query": Q, "fields": ["title^3", "body"],
        "type": "best_fields", "tie_breaker": 0.3,
    }}}
    got = search_dsl(mf.fields["title"], body, multifield=mf)
    direct = multi_match(mf, Q, k=10, boosts={"title": 3.0, "body": 1.0},
                         combine="best_fields", tie_breaker=0.3)
    assert _same(got.hits, direct)


# -------------------------------------------------------------- bool


def test_bool_must_should_not(tiny_index):
    body = {"query": {"bool": {
        "must": [{"term": {"text": "w00000"}}],
        "should": [{"term": {"text": "w00017"}}],
        "must_not": [{"term": {"text": "w00001"}}],
    }}}
    got = search_dsl(tiny_index, body)
    direct = search_topk_boolean(
        tiny_index, "w00000 AND (w00017 OR w00000) NOT w00001", k=10)
    assert _same(got.hits, direct)


def test_bool_should_is_score_only_with_must(tiny_index):
    # eligibility == must alone; docs also containing the should term
    # outrank those without it
    body = {"query": {"bool": {
        "must": [{"term": {"text": "w00000"}}],
        "should": [{"term": {"text": "w00017"}}],
    }}, "size": 1000}
    got = set(d for d, _ in _pairs(search_dsl(tiny_index, body).hits))
    must_only = set(
        d for d, _ in _pairs(search_topk(tiny_index, "w00000", k=1000)))
    assert got == must_only


def test_bool_should_required_without_must(tiny_index):
    body = {"query": {"bool": {"should": [
        {"term": {"text": "w00000"}}, {"term": {"text": "w00017"}},
    ]}}}
    assert _same(search_dsl(tiny_index, body).hits,
                 search_topk_boolean(tiny_index, "(w00000 OR w00017)", k=10))


def test_bool_filter_metadata(tiny_index, tiny_corpus):
    body = {"query": {"bool": {
        "must": [{"match": {"text": Q}}],
        "filter": [{"term": {"lang": "en"}}],
    }}}
    got = search_dsl(tiny_index, body, documents=tiny_corpus)
    direct = search_topk(
        tiny_index, Q, k=10,
        doc_filter=tiny_corpus.where("lang = 'en'").select("doc_id"))
    assert _same(got.hits, direct)


def test_bool_filter_range(tiny_index, tiny_corpus):
    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    body = {"query": {"bool": {
        "must": [{"match": {"text": Q}}],
        "filter": [{"range": {"n_chars": {"gte": 200, "lt": 900}}}],
    }}}
    got = search_dsl(tiny_index, body, documents=docs)
    direct = search_topk(
        tiny_index, Q, k=10,
        doc_filter=docs.where("n_chars >= 200 and n_chars < 900")
        .select("doc_id"))
    assert _same(got.hits, direct)


# ----------------------------------------------------- function_score


def test_function_score_dsl(tiny_index, tiny_corpus):
    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    body = {"query": {"function_score": {
        "query": {"match": {"text": Q}},
        "gauss": {"n_chars": {"origin": 800.0, "scale": 400.0}},
        "boost_mode": "multiply",
    }}}
    got = search_dsl(tiny_index, body, documents=docs)
    direct = function_score(
        tiny_index, Q, docs, k=10,
        decay={"kind": "gauss", "field": "n_chars",
               "origin": 800.0, "scale": 400.0})
    assert [(r["doc_id"], r["score"]) for r in got.hits.collect()] == [
        (r["doc_id"], r["score"]) for r in direct.collect()]


# --------------------------------------------------------------- aggs


def test_aggs_terms_and_stats(tiny_index, tiny_corpus):
    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    body = {"query": {"match": {"text": Q}},
            "aggs": {"langs": {"terms": {"field": "lang"}},
                     "len": {"stats": {"field": "n_chars"}}}}
    got = search_dsl(tiny_index, body, documents=docs)
    m = matched_docs(tiny_index, Q)
    assert sorted(map(tuple, got.aggs["langs"].collect())) == sorted(
        map(tuple, facet_counts(m, docs, ["lang"]).collect()))
    assert got.aggs["len"].collect() == stats_facet(m, docs,
                                                    "n_chars").collect()


# -------------------------------------------------------------- errors


def test_dsl_errors(tiny_index, tiny_corpus):
    with pytest.raises(DslError, match="single-key"):
        search_dsl(tiny_index, {"query": {"match": {}, "term": {}}})
    with pytest.raises(DslError, match="unsupported body keys"):
        search_dsl(tiny_index, {"query": {"match": {"text": Q}}, "from": 3})
    with pytest.raises(DslError, match="unsupported query clause"):
        search_dsl(tiny_index, {"query": {"nested": {}}})
    with pytest.raises(DslError, match="targets field"):
        search_dsl(tiny_index, {"query": {"match": {"title": Q}}})
    with pytest.raises(DslError, match="minimum_should_match > 1"):
        search_dsl(tiny_index, {"query": {"bool": {
            "should": [{"term": {"text": "a"}},
                       {"term": {"text": "b"}}],
            "minimum_should_match": 2}}})
    with pytest.raises(DslError, match="needs documents="):
        search_dsl(tiny_index, {"query": {"bool": {
            "must": [{"match": {"text": Q}}],
            "filter": [{"term": {"lang": "en"}}]}}})
    with pytest.raises(DslError, match="search_after does not compose"):
        search_dsl(tiny_index, {"query": {"bool": {
            "must": [{"term": {"text": "w00000"}}]}},
            "search_after": [1, 0.5]})
    with pytest.raises(DslError, match="aggs compose"):
        search_dsl(tiny_index, {"query": {"bool": {
            "must": [{"term": {"text": "w00000"}}]}},
            "aggs": {"x": {"terms": {"field": "lang"}}}},
            documents=tiny_corpus)


# ---------------------------------------------------------------- knn


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(100)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_knn_alone_equals_cosine_topk(tiny_index, embeddings):
    from hadoop_search_engine_spark.operators.similarity import cosine_topk

    qv = [1.0, 0.0, -1.0, 0.5, 0.0, 0.0, 2.0, -0.5]
    got = search_dsl(tiny_index, {"knn": {
        "field": "embedding", "query_vector": qv, "k": 5,
    }}, embeddings=embeddings)
    direct = cosine_topk(embeddings, qv, k=5)
    assert [tuple(r) for r in got.hits.collect()] == [
        tuple(r) for r in direct.collect()]


def test_knn_plus_query_rrf(tiny_index, embeddings):
    from hadoop_search_engine_spark.operators.hybrid import hybrid_topk

    qv = [1.0] * 8
    body = {"query": {"match": {"text": Q}},
            "knn": {"field": "embedding", "query_vector": qv, "k": 20},
            "rank": {"rrf": {"rank_window_size": 20, "rank_constant": 60}},
            "size": 5}
    got = search_dsl(tiny_index, body, embeddings=embeddings)
    direct = hybrid_topk(tiny_index, Q, embeddings, qv, k=5, k_lex=20,
                         k_vec=20, rrf_k=60)
    assert [tuple(r) for r in got.hits.collect()] == [
        tuple(r) for r in direct.collect()]


def test_knn_errors(tiny_index, embeddings):
    qv = [1.0] * 8
    with pytest.raises(DslError, match="needs embeddings"):
        search_dsl(tiny_index, {"knn": {"query_vector": qv}})
    with pytest.raises(DslError, match='"rank"'):
        search_dsl(tiny_index, {"query": {"match": {"text": Q}},
                                "knn": {"query_vector": qv}},
                   embeddings=embeddings)
    with pytest.raises(DslError, match="rank applies"):
        search_dsl(tiny_index, {"knn": {"query_vector": qv},
                                "rank": {"rrf": {}}},
                   embeddings=embeddings)


# ------------------------------------------- collapse / highlight / sort


def test_collapse_equals_direct(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import collapse_topk

    body = {"query": {"match": {"text": Q}}, "size": 3,
            "collapse": {"field": "lang", "window": 50}}
    got = search_dsl(tiny_index, body, documents=tiny_corpus)
    direct = collapse_topk(
        search_topk(tiny_index, Q, k=50),
        tiny_corpus.select("doc_id", "lang"), "lang", k=3)
    assert sorted(map(tuple, got.hits.collect())) == sorted(
        map(tuple, direct.collect()))


def test_highlight_marks_terms(tiny_index, tiny_corpus):
    body = {"query": {"match": {"text": "w00000"}}, "size": 5,
            "highlight": {"fields": {"text": {"fragment_size": 60}},
                          "pre_tags": ["<em>"], "post_tags": ["</em>"]}}
    got = search_dsl(tiny_index, body, documents=tiny_corpus)
    rows = got.hits.collect()
    assert rows and all("<em>w00000</em>" in r["snippet"].lower()
                        for r in rows)


def test_sort_by_field(tiny_index, tiny_corpus):
    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    body = {"query": {"match": {"text": Q}}, "size": 5,
            "sort": [{"n_chars": {"order": "desc"}}]}
    got = search_dsl(tiny_index, body, documents=docs)
    rows = [(r["doc_id"], r["n_chars"]) for r in got.hits.collect()]
    matched = {r["doc_id"] for r in
               matched_docs(tiny_index, Q).collect()}
    assert len(rows) == 5 and all(d in matched for d, _ in rows)
    assert [n for _, n in rows] == sorted((n for _, n in rows),
                                          reverse=True)


def test_post_stage_errors(tiny_index, tiny_corpus):
    with pytest.raises(DslError, match="need documents"):
        search_dsl(tiny_index, {"query": {"match": {"text": Q}},
                                "collapse": {"field": "lang"}})
    with pytest.raises(DslError, match="compose with the match family"):
        search_dsl(tiny_index, {"query": {"fuzzy": {"text": "w0001x"}},
                                "sort": [{"n_chars": "asc"}]},
                   documents=tiny_corpus)
    with pytest.raises(DslError, match="exactly one field"):
        search_dsl(tiny_index, {"query": {"match": {"text": Q}},
                                "sort": [{"a": "asc"}, {"b": "asc"}]},
                   documents=tiny_corpus)


# ------------------------------------------------------------ suggest


def test_suggest_completion_and_term(tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import (
        fuzzy_terms,
        suggest_terms,
    )

    body = {"suggest": {
        "c": {"prefix": "w0001", "completion": {"size": 5}},
        "t": {"text": "w0001x", "term": {"size": 3}},
    }}
    got = search_dsl(tiny_index, body)
    assert got.hits is None
    assert sorted(map(tuple, got.suggest["c"].collect())) == sorted(
        map(tuple, suggest_terms(tiny_index, "w0001", k=5).collect()))
    assert sorted(map(tuple, got.suggest["t"].collect())) == sorted(
        map(tuple, fuzzy_terms(tiny_index, "w0001x", k=3).collect()))


def test_suggest_composes_with_query(tiny_index):
    body = {"query": {"match": {"text": Q}}, "size": 3,
            "suggest": {"c": {"prefix": "w0001", "completion": {}}}}
    got = search_dsl(tiny_index, body)
    assert got.hits.count() == 3 and got.suggest["c"].count() > 0
    with pytest.raises(DslError, match="single token"):
        search_dsl(tiny_index, {"suggest": {
            "t": {"text": "two words", "term": {}}}})


# ------------------------------------- constant-score metadata leaves


def test_match_all_browses_live_docs(tiny_index, spark, tmp_path):
    n = tiny_index.doc_stats.count()
    got = search_dsl(tiny_index, {"query": {"match_all": {}},
                                  "size": 10_000}).hits.collect()
    assert len(got) == n
    assert [r["doc_id"] for r in got[:5]] == sorted(
        r["doc_id"] for r in got)[:5]          # _doc order
    assert all(r["score"] == 1.0 for r in got)
    boosted = search_dsl(tiny_index, {"query": {"match_all":
                                                {"boost": 2.5}},
                                      "size": 3}).hits.collect()
    assert [r["score"] for r in boosted] == [2.5] * 3

    # tombstoned docs vanish, like every other path
    import shutil

    from hadoop_search_engine_spark.operators.index_maint import (
        delete_docs,
    )
    from hadoop_search_engine_spark.operators.query_exec import Index

    d = str(tmp_path / "ma_idx")
    shutil.copytree(tiny_index.out_dir, d)
    ix2 = Index.load(spark, d)
    dead = [r["doc_id"] for r in got[:2]]
    delete_docs(ix2, dead)
    after = {r["doc_id"] for r in search_dsl(
        ix2, {"query": {"match_all": {}}, "size": 10_000}
    ).hits.collect()}
    assert after == {r["doc_id"] for r in got} - set(dead)


def test_ids_query(tiny_index):
    all_ids = sorted(
        r["doc_id"] for r in tiny_index.doc_stats.select("doc_id").collect()
    )
    want = [all_ids[0], all_ids[2]]
    got = search_dsl(tiny_index, {
        "query": {"ids": {"values": [*want, 999_999_999]}},
    }).hits.collect()
    assert [r["doc_id"] for r in got] == want
    with pytest.raises(DslError, match="values"):
        search_dsl(tiny_index, {"query": {"ids": {}}})


def test_exists_query(tiny_index, tiny_corpus, spark):
    meta = tiny_corpus.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("en")).alias("lang"),
    )
    got = search_dsl(tiny_index, {"query": {"exists": {"field": "lang"}},
                                  "size": 10_000},
                     documents=meta).hits.collect()
    assert len(got) > 0
    assert all(r["doc_id"] % 2 == 0 for r in got)
    # field "text" needs no metadata table (every indexed doc has it)
    n = tiny_index.doc_stats.count()
    assert search_dsl(tiny_index, {"query": {"exists": {"field": "text"}},
                                   "size": 10_000}).hits.count() == n
    with pytest.raises(DslError, match="documents"):
        search_dsl(tiny_index, {"query": {"exists": {"field": "lang"}}})
    with pytest.raises(DslError, match="search_after"):
        search_dsl(tiny_index, {"query": {"match_all": {}},
                                "search_after": [1, 1.0]})
