"""Prefix / wildcard expansion search vs explicit multi-term queries."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    expand_terms,
    prefix_search,
    search_topk,
    wildcard_search,
)

ROWS = [
    (0, "spark scan small stream"),
    (1, "sort slow spark spark"),
    (2, "scan scan scan merge"),
    (3, "merge table query"),
    (4, "stream stream sort small"),
    (5, "unrelated words only here"),
]


@pytest.fixture(scope="module")
def widx(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("widx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=4)
    return Index.load(spark, out)


def _df(term):
    return sum(1 for _i, t in ROWS if term in t.split())


def test_expand_terms_wildcard_and_cap(widx):
    # s* matches scan, slow, small, sort, spark, stream; ranked df desc, term asc
    want = sorted(
        ["scan", "slow", "small", "sort", "spark", "stream"],
        key=lambda t: (-_df(t), t),
    )
    assert expand_terms(widx, "s*", max_expansions=10) == want
    assert expand_terms(widx, "s*", max_expansions=3) == want[:3]
    # ? = exactly one char: s?an -> scan; sca? -> scan
    assert expand_terms(widx, "s?an") == ["scan"]
    assert expand_terms(widx, "s*am") == ["stream"]  # st-re-am
    assert expand_terms(widx, "s*ax") == []  # no term ends 'ax'
    assert expand_terms(widx, "st*am*") == ["stream"]
    # degenerate patterns expand to nothing (never a full-vocab query)
    assert expand_terms(widx, "*") == []
    assert expand_terms(widx, "") == []


def test_expand_terms_dataframe_path_matches_pinned(widx):
    pinned = expand_terms(widx, "s*", max_expansions=10)
    widx.lexicon_map = lambda: None  # instance attr forces the LIKE path
    try:
        unpinned = expand_terms(widx, "s*", max_expansions=10)
    finally:
        del widx.lexicon_map
    assert sorted(unpinned) == sorted(pinned)


def test_wildcard_search_equals_expanded_or_query(widx):
    exp = expand_terms(widx, "s*", max_expansions=10)
    want = search_topk(widx, " ".join(exp), k=10).collect()
    got = wildcard_search(widx, "s*", k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]
    assert got  # matches exist


def test_prefix_search_equals_wildcard_star(widx):
    a = prefix_search(widx, "s", k=10).collect()
    b = wildcard_search(widx, "s*", k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
        (r["doc_id"], round(r["score"], 9)) for r in b
    ]
    # trailing-star spelling accepted
    c = prefix_search(widx, "s*", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in c
    ]


def test_wildcard_no_match_and_empty(widx):
    assert wildcard_search(widx, "zz*", k=5).count() == 0
    assert prefix_search(widx, "", k=5).count() == 0


def test_wildcard_respects_max_expansions_semantics(widx):
    """Cap changes the expanded term set, hence scores (df-ranked cap)."""
    full = {r["doc_id"]: r["score"] for r in wildcard_search(widx, "s*", k=10).collect()}
    capped_terms = expand_terms(widx, "s*", max_expansions=2)
    capped_want = {
        r["doc_id"]: r["score"]
        for r in search_topk(widx, " ".join(capped_terms), k=10).collect()
    }
    capped = {
        r["doc_id"]: r["score"]
        for r in wildcard_search(widx, "s*", k=10, max_expansions=2).collect()
    }
    assert capped == capped_want
    assert capped != full


def test_expand_terms_like_metachars_match_nothing(widx):
    """'%' / '_' (or any non-token char) can match no [a-z0-9]+ token:
    both the pinned-regex and SQL-LIKE paths return [] (review fix:
    the LIKE fallback used to DELETE the metachars, changing results
    with vocabulary size)."""
    for pat in ("a%b", "a_b", "s%", "s*a-b"):
        assert expand_terms(widx, pat) == [], pat
        widx.lexicon_map = lambda: None
        try:
            assert expand_terms(widx, pat) == [], (pat, "LIKE path")
        finally:
            del widx.lexicon_map


# -- regexp query (ES regexp) --------------------------------------------------

def test_expand_terms_regexp(widx):
    from hadoop_search_engine_spark.operators.query_exec import (
        expand_terms_regexp,
    )

    # anchored: sp.*k matches spark only (whole-term semantics)
    assert expand_terms_regexp(widx, "sp.*k") == ["spark"]
    # alternation + class, ranked df desc then term asc, cap honored
    want = sorted(["scan", "sort", "spark"], key=lambda t: (-_df(t), t))
    assert expand_terms_regexp(widx, "s(can|ort|park)") == want
    assert expand_terms_regexp(widx, "s(can|ort|park)", max_expansions=2) == want[:2]
    # no-match and empty patterns
    assert expand_terms_regexp(widx, "zz+") == []
    assert expand_terms_regexp(widx, "") == []
    # invalid pattern raises cleanly
    with pytest.raises(ValueError):
        expand_terms_regexp(widx, "s(")


def test_regexp_search_equals_explicit_terms(widx):
    from hadoop_search_engine_spark.operators.query_exec import regexp_search

    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in regexp_search(widx, "s(can|ort|park)", k=10).collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in search_topk(widx, "scan sort spark", k=10).collect()
    ]
    assert got == want and got


def test_expand_terms_regexp_sql_path_matches_map_path(widx):
    """Force the lexicon-table RLIKE path and compare with the pinned map."""
    from hadoop_search_engine_spark.operators.query_exec import (
        expand_terms_regexp,
    )

    want = expand_terms_regexp(widx, "s(can|ort|park)")
    orig = widx.lexicon_map
    try:
        widx.lexicon_map = lambda: None
        assert expand_terms_regexp(widx, "s(can|ort|park)") == want
    finally:
        widx.lexicon_map = orig


# -- field-sorted search (ES sort) ---------------------------------------------

def test_sorted_matches_orders_by_field(widx, spark):
    from hadoop_search_engine_spark.operators.query_exec import sorted_matches

    # matched docs for "spark OR merge": 0,1,2,3
    fields = spark.createDataFrame(
        [(0, 5.0), (1, 9.0), (2, 7.0), (3, 9.0), (4, 100.0), (5, 100.0)],
        "doc_id long, val double",
    )
    got = [(r["doc_id"], r["val"])
           for r in sorted_matches(widx, "spark merge", fields, "val",
                                   k=10).collect()]
    # desc by val, doc_id asc tiebreak; non-matching docs 4,5 excluded
    assert got == [(1, 9.0), (3, 9.0), (2, 7.0), (0, 5.0)]
    asc = [(r["doc_id"], r["val"])
           for r in sorted_matches(widx, "spark merge", fields, "val",
                                   k=2, ascending=True).collect()]
    assert asc == [(0, 5.0), (2, 7.0)]


def test_sorted_matches_missing_fields_sort_last(widx, spark):
    from hadoop_search_engine_spark.operators.query_exec import sorted_matches

    fields = spark.createDataFrame([(0, 5.0), (2, 7.0)], "doc_id long, val double")
    got = [(r["doc_id"], r["val"])
           for r in sorted_matches(widx, "spark merge", fields, "val",
                                   k=10).collect()]
    assert got[:2] == [(2, 7.0), (0, 5.0)]
    assert {g[0] for g in got[2:]} == {1, 3}
    assert all(g[1] is None for g in got[2:])
