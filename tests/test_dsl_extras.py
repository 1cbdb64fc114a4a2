"""Session-8 DSL + aggregation additions: dis_max / boosting /
constant_score query kinds, and composite / terms-with-sub-aggs /
extended_stats / filters aggregations. The DSL adds no scoring code,
so identity with the direct calls (or a brute-force replay) is the
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.analytics import (
    composite_agg,
    composite_agg_facet,
    extended_stats_facet,
    filters_facet,
    terms_metrics_facet,
)
from hadoop_search_engine_spark.operators.dsl import DslError, search_dsl
from hadoop_search_engine_spark.operators.multifield import (
    combine_scored_parts,
)
from hadoop_search_engine_spark.operators.query_exec import (
    facet_counts,
    matched_docs,
    scored_docs,
    search_topk,
)

Q = "w00000 w00017"
Q2 = "w00001 w00002"


def _pairs(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


# ----------------------------------------------------------- dis_max


def test_dis_max_single_query_equals_search_topk(tiny_index):
    got = search_dsl(
        tiny_index,
        {"query": {"dis_max": {"queries": [{"match": {"text": Q}}]}},
         "size": 8},
    )
    assert _pairs(got.hits) == _pairs(search_topk(tiny_index, Q, k=8))


def test_dis_max_matches_manual_best_fields_combine(tiny_index):
    tie = 0.3
    got = search_dsl(
        tiny_index,
        {"query": {"dis_max": {
            "queries": [{"match": {"text": Q}}, {"term": {"text": "w00002"}}],
            "tie_breaker": tie}}, "size": 10},
    )
    parts = [
        scored_docs(tiny_index, Q),
        scored_docs(tiny_index, "w00002"),
    ]
    want = combine_scored_parts(parts, "best_fields", tie, 10)
    assert _pairs(got.hits) == _pairs(want)


def test_dis_max_validates(tiny_index):
    with pytest.raises(DslError, match="needs queries"):
        search_dsl(tiny_index, {"query": {"dis_max": {"queries": []}}})
    with pytest.raises(DslError, match="tie_breaker"):
        search_dsl(tiny_index, {"query": {"dis_max": {
            "queries": [{"match": {"text": Q}}], "tie_breaker": 1.5}}})


# ----------------------------------------------------------- boosting


def test_boosting_demotes_but_keeps_negative_matches(tiny_index):
    nb = 0.2
    got = search_dsl(
        tiny_index,
        {"query": {"boosting": {
            "positive": {"match": {"text": Q}},
            "negative": {"term": {"text": "w00017"}},
            "negative_boost": nb}}, "size": 200},
    ).hits.collect()
    pos = {r["doc_id"]: r["score"]
           for r in scored_docs(tiny_index, Q).collect()}
    neg = {r["doc_id"] for r in
           matched_docs(tiny_index, "w00017").collect()}
    assert {r["doc_id"] for r in got} == set(pos)  # demotion, not removal
    for r in got:
        want = pos[r["doc_id"]] * (nb if r["doc_id"] in neg else 1.0)
        assert math.isclose(r["score"], want, rel_tol=1e-12)
    # demoted docs sort below untouched ones with comparable base
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_boosting_neutral_at_boost_one(tiny_index):
    got = search_dsl(
        tiny_index,
        {"query": {"boosting": {
            "positive": {"match": {"text": Q}},
            "negative": {"term": {"text": "w00017"}},
            "negative_boost": 1.0}}, "size": 9},
    )
    assert _pairs(got.hits) == _pairs(search_topk(tiny_index, Q, k=9))


# ------------------------------------------------------ constant_score


def test_constant_score_is_matched_set_in_doc_order(tiny_index):
    boost = 3.5
    got = search_dsl(
        tiny_index,
        {"query": {"constant_score": {
            "filter": {"match": {"text": Q}}, "boost": boost}},
         "size": 500},
    ).hits.collect()
    want = sorted(
        r["doc_id"] for r in matched_docs(tiny_index, Q).collect()
    )
    assert [r["doc_id"] for r in got] == want
    assert all(r["score"] == boost for r in got)


# ------------------------------------------------------------ composite


def _docs(tiny_corpus):
    return tiny_corpus.withColumn("n_chars", F.length("text"))


def test_composite_pages_cover_terms_facet(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    want = sorted(
        (r["lang"], r["n_docs"])
        for r in facet_counts(m, docs, ["lang"]).collect()
    )
    pages = []
    after = None
    while True:
        page = composite_agg_facet(
            m, docs, [("lang", "terms", "lang")], size=2, after=after
        ).collect()
        if not page:
            break
        pages.extend((r["lang"], r["n_docs"]) for r in page)
        after = (page[-1]["lang"],)
    assert pages == want  # already in key order, no dup/missing buckets


def test_composite_multi_source_key_order_and_after(spark):
    rows = [(i, "ab"[i % 2], i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "g", "v"])
    full = composite_agg(
        df, [("g", "terms", "g"), ("vb", "histogram", "v", 2.0)], size=100
    ).collect()
    keys = [(r["g"], r["vb"]) for r in full]
    assert keys == sorted(keys)
    # keyset resume: page after the 2nd key == tail of the full listing
    after = keys[1]
    tail = composite_agg(
        df, [("g", "terms", "g"), ("vb", "histogram", "v", 2.0)],
        size=100, after=after,
    ).collect()
    assert [(r["g"], r["vb"]) for r in tail] == keys[2:]


def test_composite_date_histogram_source(spark):
    df = spark.sql(
        "SELECT id AS doc_id, "
        "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,id,0,0,0)"
        " AS ts FROM range(10)"
    )
    out = composite_agg(df, [("day", "date_histogram", "ts", "day")],
                        size=20).collect()
    assert len(out) == 10
    assert sum(r["n_docs"] for r in out) == 10


def test_composite_validates(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="at least one source"):
        composite_agg(df, [], size=2)
    with pytest.raises(ValueError, match="after key"):
        composite_agg(df, [("a", "terms", "doc_id")], size=2,
                      after=(1, 2))
    with pytest.raises(ValueError, match="source kind"):
        composite_agg(df, [("a", "percentile", "doc_id")], size=2)


# --------------------------------------------------- terms sub-aggs


def test_terms_metrics_matches_manual_groupby(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = {
        r["lang"]: (r["n_docs"], r["avg_len"], r["max_len"], r["n_langs"])
        for r in terms_metrics_facet(
            m, docs, "lang",
            {"avg_len": ("avg", "n_chars"), "max_len": ("max", "n_chars"),
             "n_langs": ("cardinality", "lang")},
        ).collect()
    }
    hits = docs.join(m.select("doc_id"), "doc_id", "left_semi").collect()
    byg: dict[str, list[int]] = {}
    for r in hits:
        byg.setdefault(r["lang"], []).append(r["n_chars"])
    for g, vals in byg.items():
        n, avg, mx, card = got[g]
        assert n == len(vals)
        assert avg == round(sum(vals) / len(vals), 6)
        assert mx == max(vals)
        assert card == 1
    assert set(got) == set(byg)


def test_dsl_terms_sub_aggs(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"langs": {"terms": {"field": "lang"},
                            "aggs": {"avg_len": {"avg": {"field":
                                                         "n_chars"}}}}}},
        documents=docs,
    )
    m = matched_docs(tiny_index, Q)
    want = terms_metrics_facet(m, docs, "lang",
                               {"avg_len": ("avg", "n_chars")})
    assert sorted(map(tuple, got.aggs["langs"].collect())) == sorted(
        map(tuple, want.collect())
    )


# ------------------------------------------------------ extended_stats


def test_extended_stats_matches_numpy(tiny_index, tiny_corpus):
    import numpy as np

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    row = extended_stats_facet(m, docs, "n_chars").collect()[0]
    vals = np.array(
        [r["n_chars"] for r in docs.join(
            m.select("doc_id"), "doc_id", "left_semi").collect()],
        dtype=np.float64,
    )
    assert row["n_docs"] == len(vals)
    assert row["sum"] == vals.sum()
    assert row["sum_of_squares"] == (vals * vals).sum()
    mean = vals.sum() / len(vals)
    var_pop = (vals * vals).sum() / len(vals) - mean * mean
    assert math.isclose(row["variance"], round(var_pop, 6), abs_tol=1e-6)
    assert math.isclose(
        row["std_deviation"], round(math.sqrt(var_pop), 6), abs_tol=1e-6
    )
    var_samp = ((vals * vals).sum() - vals.sum() ** 2 / len(vals)) / (
        len(vals) - 1
    )
    assert math.isclose(
        row["variance_sampling"], round(var_samp, 6), abs_tol=1e-6
    )
    assert math.isclose(
        row["std_upper"], round(mean + 2 * math.sqrt(var_pop), 6),
        abs_tol=1e-6,
    )


def test_dsl_extended_stats_and_filters(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "len": {"extended_stats": {"field": "n_chars"}},
             "cuts": {"filters": {"filters": {
                 "en": {"term": {"lang": "en"}},
                 "long": {"range": {"n_chars": {"gte": 200}}},
             }}},
         }},
        documents=docs,
    )
    m = matched_docs(tiny_index, Q)
    assert got.aggs["len"].collect() == extended_stats_facet(
        m, docs, "n_chars").collect()
    want = filters_facet(
        m, docs,
        {"en": F.col("lang") == "en", "long": F.col("n_chars") >= 200},
    )
    assert got.aggs["cuts"].collect() == want.collect()


def test_filters_facet_counts_and_order(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    out = filters_facet(
        m, docs,
        {"all": "n_chars >= 0", "none": "n_chars < 0",
         "en": F.col("lang") == "en"},
    ).collect()
    assert [r["filter_label"] for r in out] == ["all", "none", "en"]
    n_hits = docs.join(m.select("doc_id"), "doc_id", "left_semi").count()
    assert out[0]["n_docs"] == n_hits
    assert out[1]["n_docs"] == 0


# -------------------------------------- bool.filter + term structure


def test_boolean_doc_filter_exact_vs_posthoc(tiny_index, tiny_corpus):
    """doc_filter must compose EXACTLY: equal to scoring the whole
    boolean match set, filtering, then cutting top-k."""
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    expr = "w00000 AND (w00017 OR w00002) NOT w00001"
    flt = tiny_corpus.where(F.length("text") >= 100).select("doc_id")
    got = search_topk_boolean(tiny_index, expr, k=5, doc_filter=flt)
    full = search_topk_boolean(tiny_index, expr, k=10**6,
                               serving="spark").collect()
    allowed = {r["doc_id"] for r in flt.collect()}
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in full if r["doc_id"] in allowed
    ]
    want = sorted(want, key=lambda t: (-t[1], t[0]))[:5]
    assert _pairs(got) == want


def test_boolean_doc_filter_rejects_driver(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    with pytest.raises(ValueError, match="distributed serving"):
        search_topk_boolean(
            tiny_index, "w00000 AND w00017", serving="driver",
            doc_filter=tiny_corpus.select("doc_id"),
        )


def test_dsl_structured_bool_with_metadata_filter(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    docs = tiny_corpus.withColumn("n_chars", F.length("text"))
    body = {"query": {"bool": {
        "must": [{"term": {"text": "w00000"}}],
        "must_not": [{"term": {"text": "w00001"}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }}, "size": 7}
    got = search_dsl(tiny_index, body, documents=docs)
    flt = docs.where(F.col("n_chars") >= 100).select("doc_id")
    want = search_topk_boolean(
        tiny_index, "w00000 NOT w00001", k=7, doc_filter=flt
    )
    assert _pairs(got.hits) == _pairs(want)


# ------------------------------------------- more_like_this + range


def test_dsl_more_like_this_equals_direct_call(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        more_like_this,
    )

    got = search_dsl(
        tiny_index,
        {"query": {"more_like_this": {
            "like": [{"_id": 3}], "max_query_terms": 4}}, "size": 6},
        documents=tiny_corpus,
    )
    want = more_like_this(tiny_index, tiny_corpus, 3, m=4, k=6)
    assert _pairs(got.hits) == _pairs(want)
    assert all(r["doc_id"] != 3 for r in got.hits.collect())


def test_dsl_more_like_this_validates(tiny_index, tiny_corpus):
    with pytest.raises(DslError, match="documents="):
        search_dsl(tiny_index,
                   {"query": {"more_like_this": {"like": [{"_id": 1}]}}})
    with pytest.raises(DslError, match="_id"):
        search_dsl(tiny_index,
                   {"query": {"more_like_this": {"like": ["raw text"]}}},
                   documents=tiny_corpus)


def test_dsl_range_query_constant_score_doc_order(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"range": {"n_chars": {"gte": 100, "lt": 300,
                                         "boost": 1.5}}}, "size": 1000},
        documents=docs,
    ).hits.collect()
    want = sorted(
        r["doc_id"]
        for r in docs.where("n_chars >= 100 AND n_chars < 300").collect()
    )
    assert [r["doc_id"] for r in got] == want
    assert all(r["score"] == 1.5 for r in got)


# -------------------------------------------------------- random_score


def test_function_score_random_deterministic_and_in_range(
    tiny_index, tiny_corpus
):
    from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref_str
    from hadoop_search_engine_spark.operators.hybrid import function_score
    from hadoop_search_engine_spark.operators.query_exec import scored_docs

    docs = _docs(tiny_corpus)
    out = function_score(
        tiny_index, Q, docs, k=300, random_score={"seed": 7},
    ).collect()
    rel = {r["doc_id"]: round(r["score"], 4)
           for r in scored_docs(tiny_index, Q).collect()}
    assert {r["doc_id"] for r in out} == set(rel)
    for r in out:
        want_fac = round(
            mm3_u32_ref_str(str(r["doc_id"]), salt="rs:7") / 2**32, 6
        )
        assert r["factor"] == want_fac
        assert 0.0 <= r["factor"] < 1.0
        assert r["score"] == round(rel[r["doc_id"]] * want_fac, 6)
    again = function_score(
        tiny_index, Q, docs.repartition(5), k=300,
        random_score={"seed": 7},
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_dsl_random_score_clause(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.hybrid import function_score

    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"function_score": {
            "query": {"match": {"text": Q}},
            "random_score": {"seed": 7}}}, "size": 5},
        documents=docs,
    )
    want = function_score(tiny_index, Q, docs, k=5,
                          random_score={"seed": 7})
    assert got.hits.collect() == want.collect()


def test_aggs_compose_with_dis_max_and_constant_score(
    tiny_index, tiny_corpus
):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"dis_max": {"queries": [
            {"match": {"text": Q}}, {"term": {"text": "w00002"}}]}},
         "aggs": {"langs": {"terms": {"field": "lang"}}}},
        documents=docs,
    )
    m = matched_docs(tiny_index, Q).select("doc_id").unionByName(
        matched_docs(tiny_index, "w00002").select("doc_id")
    ).distinct()
    want = facet_counts(m, docs, ["lang"])
    assert sorted(map(tuple, got.aggs["langs"].collect())) == sorted(
        map(tuple, want.collect()))
    got2 = search_dsl(
        tiny_index,
        {"query": {"constant_score": {"filter": {"match": {"text": Q}}}},
         "aggs": {"len": {"stats": {"field": "n_chars"}}}},
        documents=docs,
    )
    from hadoop_search_engine_spark.operators.query_exec import stats_facet

    want2 = stats_facet(matched_docs(tiny_index, Q), docs, "n_chars")
    assert got2.aggs["len"].collect() == want2.collect()
    with pytest.raises(DslError, match="top_hits needs"):
        search_dsl(
            tiny_index,
            {"query": {"constant_score": {"filter": {"match":
                                                     {"text": Q}}}},
             "aggs": {"h": {"top_hits": {"field": "lang"}}}},
            documents=docs,
        )


def test_terms_agg_size_and_min_doc_count(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    full = sorted(
        ((r["lang"], r["n_docs"])
         for r in facet_counts(m, docs, ["lang"]).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"langs": {"terms": {"field": "lang", "size": 2}}}},
        documents=docs,
    )
    assert [(r["lang"], r["n_docs"])
            for r in got.aggs["langs"].collect()] == full[:2]
    floor = full[0][1]  # only buckets at the max count survive
    got2 = facet_counts(m, docs, ["lang"], min_doc_count=floor).collect()
    assert all(r["n_docs"] >= floor for r in got2)


def test_snippet_fragments_windows_and_counts(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        snippet_fragments,
    )

    top = search_topk(tiny_index, Q, k=5)
    out = snippet_fragments(top, tiny_corpus, Q.split(), width=10,
                            n_fragments=2).collect()
    assert len(out) == 5
    texts = {r["doc_id"]: r["text"]
             for r in tiny_corpus.select("doc_id", "text").collect()}
    for r in out:
        t = texts[r["doc_id"]].lower()
        want_pos = sorted({p for p in
                           (t.find("w00000") + 1, t.find("w00017") + 1)
                           if p > 0})
        assert r["n_matched_terms"] == len(want_pos)
        frags = r["fragments"].split(" | ") if r["fragments"] else []
        assert len(frags) == min(len(want_pos), 2)
        for f, p in zip(frags, want_pos[:2]):
            start = max(p - 10, 1) - 1
            assert texts[r["doc_id"]][start:start + 20] == f


def test_missing_percentile_ranks_adjacency(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        adjacency_matrix_facet,
        missing_facet,
        percentile_ranks_facet,
    )

    docs = _docs(tiny_corpus).withColumn(
        "maybe", F.when(F.col("doc_id") % 3 == 0, F.col("lang"))
    )
    m = matched_docs(tiny_index, Q)
    hits = [r for r in docs.join(m.select("doc_id"), "doc_id",
                                 "left_semi").collect()]
    # missing
    got = missing_facet(m, docs, "maybe").collect()[0]["n_missing"]
    assert got == sum(1 for r in hits if r["maybe"] is None)
    # percentile_ranks
    vals = (150.0, 250.0)
    pr = percentile_ranks_facet(m, docs, "n_chars", vals).collect()
    xs = [r["n_chars"] for r in hits]
    for row, v in zip(pr, vals):
        want = round(sum(1 for x in xs if x <= v) * 100.0 / len(xs), 6)
        assert row["value"] == v and abs(row["percent"] - want) < 1e-9
    # adjacency matrix through the DSL
    got2 = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"adj": {"adjacency_matrix": {"filters": {
             "en": {"term": {"lang": "en"}},
             "long": {"range": {"n_chars": {"gte": 200}}},
         }}}}},
        documents=docs,
    ).aggs["adj"].collect()
    n_en = sum(1 for r in hits if r["lang"] == "en")
    n_long = sum(1 for r in hits if r["n_chars"] >= 200)
    n_both = sum(1 for r in hits
                 if r["lang"] == "en" and r["n_chars"] >= 200)
    assert {(r["key"], r["n_docs"]) for r in got2} == {
        ("en", n_en), ("long", n_long), ("en&long", n_both)}
    want2 = adjacency_matrix_facet(
        m, docs, {"en": F.col("lang") == "en",
                  "long": F.col("n_chars") >= 200}).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, want2))


# ------------------------------------------------ simple_query_string


def test_simple_query_string_forms(tiny_index):
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    # plain tokens == match
    got = search_dsl(tiny_index,
                     {"query": {"simple_query_string": {"query": Q}},
                      "size": 6})
    assert _pairs(got.hits) == _pairs(search_topk(tiny_index, Q, k=6))
    # default_operator and
    got = search_dsl(tiny_index, {"query": {"simple_query_string": {
        "query": Q, "default_operator": "and"}}, "size": 6})
    assert _pairs(got.hits) == _pairs(
        search_topk(tiny_index, Q, k=6, mode="and"))
    # negation routes through the boolean engine
    got = search_dsl(tiny_index, {"query": {"simple_query_string": {
        "query": "w00000 w00017 -w00001"}}, "size": 8})
    want = search_topk_boolean(tiny_index, "(w00000 OR w00017) NOT w00001",
                               k=8)
    assert _pairs(got.hits) == _pairs(want)



def test_bool_filter_terms_and_exists(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus).withColumn(
        "maybe", F.when(F.col("doc_id") % 2 == 0, F.lit("x"))
    )
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    keep = sorted(langs)[:2]
    got = search_dsl(
        tiny_index,
        {"query": {"bool": {
            "must": [{"match": {"text": Q}}],
            "filter": [{"terms": {"lang": keep}},
                       {"exists": {"field": "maybe"}}]}}, "size": 100},
        documents=docs,
    ).hits.collect()
    flt = docs.where(F.col("lang").isin(keep)
                     & F.col("maybe").isNotNull()).select("doc_id")
    want = search_topk(tiny_index, Q, k=100, doc_filter=flt).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want]
    with pytest.raises(DslError, match="non-empty value list"):
        search_dsl(tiny_index,
                   {"query": {"bool": {"must": [{"match": {"text": Q}}],
                                       "filter": [{"terms": {"lang": []}}]}}},
                   documents=docs)


# ------------------------------------------------------- rank_feature


def test_rank_feature_matches_python_reference(tiny_index, tiny_corpus):
    import math as _math

    from hadoop_search_engine_spark.operators.hybrid import (
        rank_feature_topk,
    )

    docs = _docs(tiny_corpus).withColumn(
        "feat", F.when(F.col("doc_id") % 4 != 0, F.col("n_chars"))
    )  # every 4th doc lacks the feature -> no boost, not excluded
    rel = {r["doc_id"]: round(r["score"], 4)
           for r in scored_docs(tiny_index, Q).collect()}
    feats = {r["doc_id"]: r["feat"] for r in docs.collect()}
    for fn, kw, sfun in [
        ("saturation", {"pivot": 150.0},
         lambda f: f / (f + 150.0)),
        ("log", {"scaling": 2.0}, lambda f: _math.log(2.0 + f)),
        ("sigmoid", {"pivot": 150.0, "exponent": 2.0},
         lambda f: f**2 / (f**2 + 150.0**2)),
    ]:
        got = rank_feature_topk(
            tiny_index, Q, docs, "feat", fn=fn, boost=0.7, k=300, **kw
        ).collect()
        assert {r["doc_id"] for r in got} == set(rel)
        for r in got:
            f = feats[r["doc_id"]]
            s = round(sfun(float(f)), 6) if f and f > 0 else 0.0
            # F.round is HALF_UP, Python round is banker's: compare
            # the 6dp values with a half-ulp tolerance
            assert abs(r["feature_score"] - s) <= 5.1e-7, (fn, r)
            assert abs(
                r["score"] - (rel[r["doc_id"]] + 0.7 * s)
            ) <= 1.1e-6, (fn, r)


def test_dsl_rank_feature_clause(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.hybrid import (
        rank_feature_topk,
    )

    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"rank_feature": {
            "field": "n_chars", "saturation": {"pivot": 200.0},
            "boost": 1.2, "query": {"match": {"text": Q}}}}, "size": 7},
        documents=docs,
    )
    want = rank_feature_topk(tiny_index, Q, docs, "n_chars",
                             fn="saturation", pivot=200.0, boost=1.2, k=7)
    assert got.hits.collect() == want.collect()
    with pytest.raises(DslError, match="saturation/log/sigmoid"):
        search_dsl(tiny_index,
                   {"query": {"rank_feature": {
                       "field": "n_chars",
                       "query": {"match": {"text": Q}}}}},
                   documents=docs)


def test_global_agg_ignores_query(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import stats_facet

    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "hits_len": {"stats": {"field": "n_chars"}},
             "all": {"global": {},
                     "aggs": {"corpus_len": {"stats":
                                             {"field": "n_chars"}}}},
         }},
        documents=docs,
    )
    live = tiny_index.doc_stats.select("doc_id")
    want_all = stats_facet(live, docs, "n_chars").collect()
    assert got.aggs["all.corpus_len"].collect() == want_all
    # the sibling agg still reflects only the query's hits
    m = matched_docs(tiny_index, Q)
    assert got.aggs["hits_len"].collect() == stats_facet(
        m, docs, "n_chars").collect()


def test_dsl_highlight_multi_fragment(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        snippet_fragments,
    )

    body = {"query": {"match": {"text": Q}},
            "highlight": {"fields": {"text": {
                "fragment_size": 20, "number_of_fragments": 2}}},
            "size": 5}
    got = search_dsl(tiny_index, body, documents=tiny_corpus)
    want = snippet_fragments(search_topk(tiny_index, Q, k=5),
                             tiny_corpus, Q.split(), width=10,
                             n_fragments=2)
    assert sorted(map(tuple, got.hits.collect())) == sorted(
        map(tuple, want.collect()))
    with pytest.raises(DslError, match="single-fragment"):
        search_dsl(tiny_index, {
            "query": {"match": {"text": Q}},
            "highlight": {"pre_tags": ["<b>"],
                          "fields": {"text":
                                     {"number_of_fragments": 2}}},
        }, documents=tiny_corpus)


# ----------------------------------------------------- runtime_mappings


def _docs_meta(tiny_corpus):
    return tiny_corpus.withColumn("n_chars", F.length("text"))


def test_runtime_mapping_in_filter_matches_manual(tiny_index, tiny_corpus):
    docs = _docs_meta(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {
            "runtime_mappings": {
                "kchars": {
                    "type": "double",
                    "script": {"source": "emit(doc['n_chars'].value / 1000)"},
                }
            },
            "query": {"bool": {
                "must": [{"match": {"text": Q}}],
                "filter": [{"range": {"kchars": {"gte": 1.0}}}],
            }},
            "size": 50,
        },
        documents=docs,
    )
    allowed = {
        r["doc_id"]
        for r in docs.where(F.length("text") >= 1000).collect()
    }
    base = search_dsl(
        tiny_index, {"query": {"match": {"text": Q}}, "size": 10_000},
        documents=docs,
    )
    want = [(d, s) for d, s in _pairs(base.hits) if d in allowed][:50]
    assert _pairs(got.hits) == want


def test_runtime_mapping_in_aggs_and_chaining(tiny_index, tiny_corpus):
    docs = _docs_meta(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {
            "runtime_mappings": {
                "kchars": {
                    "type": "double",
                    "script": {"source": "emit(doc['n_chars'].value / 1000)"},
                },
                "big": {  # runtime-on-runtime reference
                    "type": "boolean",
                    "script": {"source": "emit(doc['kchars'].value >= 1.0)"},
                },
            },
            "query": {"match": {"text": Q}},
            "size": 0,
            "aggs": {"mean_k": {"avg": {"field": "kchars"}},
                     "bigs": {"terms": {"field": "big"}}},
        },
        documents=docs,
    )
    hit_ids = {
        r["doc_id"]
        for r in search_dsl(
            tiny_index, {"query": {"match": {"text": Q}}, "size": 10_000}
        ).hits.collect()
    }
    sub = docs.where(F.col("doc_id").isin(hit_ids))
    want_avg = sub.agg(F.avg(F.length("text") / 1000.0)).collect()[0][0]
    got_avg = got.aggs["mean_k"].collect()[0]["value"]
    assert math.isclose(got_avg, round(want_avg, 6), rel_tol=1e-9)
    bigs = {r["big"]: r["n_docs"] for r in got.aggs["bigs"].collect()}
    want_big = sub.where(F.length("text") >= 1000).count()
    assert bigs.get(True, 0) == want_big


def test_runtime_mapping_rejections(tiny_index, tiny_corpus):
    docs = _docs_meta(tiny_corpus)

    def body(source, typ="double"):
        return {
            "runtime_mappings": {
                "x": {"type": typ, "script": {"source": source}}},
            "query": {"match": {"text": Q}},
        }

    with pytest.raises(DslError, match="needs documents"):
        search_dsl(tiny_index, body("emit(doc['n_chars'].value)"))
    with pytest.raises(DslError, match="must be emit"):
        search_dsl(tiny_index, body("doc['n_chars'].value"), documents=docs)
    with pytest.raises(DslError, match="not a document column"):
        search_dsl(tiny_index, body("emit(doc['nope'].value)"),
                   documents=docs)
    with pytest.raises(DslError, match="unsupported runtime script"):
        search_dsl(tiny_index, body("emit(__import__('os').getpid())"),
                   documents=docs)
    with pytest.raises(DslError, match="type must be one of"):
        search_dsl(tiny_index,
                   body("emit(doc['n_chars'].value)", typ="keyword"),
                   documents=docs)


# ------------------------ terms_set / intervals / bool_prefix / script_score


def test_terms_set_equals_min_should_match(tiny_index):
    got = search_dsl(
        tiny_index,
        {"query": {"terms_set": {"text": {
            "terms": ["w00000", "w00017", "w00123"],
            "minimum_should_match": 2}}}, "size": 15},
    )
    want = search_topk(tiny_index, "w00000 w00017 w00123", k=15,
                       min_should_match=2)
    assert _pairs(got.hits) == _pairs(want)
    with pytest.raises(DslError, match="minimum_should_match"):
        search_dsl(tiny_index, {"query": {"terms_set": {"text": {
            "terms": ["w00000"]}}}})


@pytest.fixture(scope="module")
def tiny_index_pos(spark, tiny_corpus, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path_factory.mktemp("posidx") / "tiny_pos")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                n_buckets=8, positions=True)
    return Index.load(spark, out)


def test_intervals_maps_to_positional_engines(tiny_index_pos):
    from hadoop_search_engine_spark.operators.query_exec import (
        near_search,
        phrase_search,
    )

    idx = tiny_index_pos
    phrase = "w00000 w00001"
    got_o = search_dsl(
        idx,
        {"query": {"intervals": {"text": {"match": {
            "query": phrase, "max_gaps": 2, "ordered": True}}}},
         "size": 10},
    )
    assert _pairs(got_o.hits) == _pairs(
        phrase_search(idx, phrase, k=10, slop=2))
    got_u = search_dsl(
        idx,
        {"query": {"intervals": {"text": {"match": {
            "query": phrase, "max_gaps": 3, "ordered": False}}}},
         "size": 10},
    )
    assert _pairs(got_u.hits) == _pairs(
        near_search(idx, phrase, window=5, k=10))
    with pytest.raises(DslError, match="max_gaps"):
        search_dsl(idx, {"query": {"intervals": {"text": {"match": {
            "query": phrase}}}}})


def test_match_bool_prefix_equals_manual_expansion(tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import suggest_terms

    exp = [r["term"] for r in suggest_terms(tiny_index, "w0001", k=20).collect()]
    assert exp  # prefix matches several vocab terms
    got = search_dsl(
        tiny_index,
        {"query": {"match_bool_prefix": {"text": {
            "query": "w00000 w0001", "max_expansions": 20}}}, "size": 12},
    )
    want = search_topk(tiny_index, " ".join(["w00000"] + exp), k=12)
    assert _pairs(got.hits) == _pairs(want)


def test_script_score_matches_manual(tiny_index, tiny_corpus):
    docs = _docs_meta(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"script_score": {
            "query": {"match": {"text": Q}},
            "script": {"source":
                       "_score * doc['n_chars'].value / 1000"}}},
         "size": 10},
        documents=docs,
    )
    from hadoop_search_engine_spark.operators.query_exec import scored_docs

    full = scored_docs(tiny_index, Q)
    want = (
        docs.join(full, "doc_id")
        .select("doc_id",
                (F.col("score") * F.length("text") / 1000.0).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    assert [(r["doc_id"], round(r["score"], 9)) for r in got.hits.collect()] \
        == [(r["doc_id"], round(r["s"], 9)) for r in want]
    with pytest.raises(DslError, match="needs documents"):
        search_dsl(tiny_index, {"query": {"script_score": {
            "query": {"match": {"text": Q}},
            "script": {"source": "_score * 2"}}}})
    with pytest.raises(DslError, match="unsupported runtime script"):
        search_dsl(tiny_index, {"query": {"script_score": {
            "query": {"match": {"text": Q}},
            "script": {"source": "__import__('os')"}}}},
            documents=docs)


def test_match_bool_prefix_on_stemmed_index(spark, tmp_path):
    """Porter stemming is not idempotent (porter('degrees')='degre',
    porter('degre')='degr'): match_bool_prefix must search its lexicon
    expansions as PRE-ANALYZED terms, never re-join them into text for
    the index analyzer to re-stem — regression for the silent
    no-match on stemmed indexes."""
    from hadoop_search_engine_spark.functions.analyzer import porter_stem
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    assert porter_stem("degrees") == "degre"
    assert porter_stem("degre") == "degr"  # the non-idempotent pair
    docs = spark.createDataFrame(
        [
            (0, "temperature degrees celsius rising"),
            (1, "a degree in physics"),
            (2, "nothing related here"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "mbp_ix")
    build_index(spark, docs, out, num_shards=1, n_buckets=2,
                stem="porter")
    ix = Index.load(spark, out)
    got = search_dsl(
        ix,
        {"query": {"match_bool_prefix": {"text": {"query": "degrees"}}},
         "size": 10},
    )
    hits = {r["doc_id"] for r in got.hits.collect()}
    assert hits == {0, 1}  # 'degre' lexicon expansion matched as-is


def test_parse_query_list_form_skips_analyzer():
    """parse_query / parse_query_boosted accept a pre-analyzed term
    list: no tokenize, no synonyms, no token_fn — first-seen dedup
    only."""
    from hadoop_search_engine_spark.functions.analyzer import porter_stem
    from hadoop_search_engine_spark.operators.query_exec import (
        parse_query,
        parse_query_boosted,
    )

    assert parse_query(["degre", "run", "degre"],
                       {"degre": "x"}, porter_stem) == ["degre", "run"]
    terms, boosts = parse_query_boosted(["degre", "degre", "b"],
                                        None, porter_stem)
    assert terms == ["degre", "b"] and boosts == {}
