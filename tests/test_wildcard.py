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
