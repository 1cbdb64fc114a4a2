from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.query_exec import (
    parse_query,
    parse_query_boosted,
    search_topk,
    search_topk_rows,
)


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ------------------------------------------------------------- parsing


def test_parse_no_boost_matches_parse_query():
    q = "Spark, QUERY table spark"
    assert parse_query_boosted(q) == (parse_query(q), {})


def test_parse_boost_syntax():
    terms, boosts = parse_query_boosted("spark^2 query table^0.5")
    assert terms == ["spark", "query", "table"]
    assert boosts == {"spark": 2.0, "table": 0.5}


def test_parse_boost_first_seen_dedup():
    terms, boosts = parse_query_boosted("spark^2 spark^9 spark")
    assert terms == ["spark"]
    assert boosts == {"spark": 2.0}


def test_parse_boost_on_synonym_lands_on_canonical():
    terms, boosts = parse_query_boosted("car^3", {"car": "w00001"})
    assert terms == ["w00001"]
    assert boosts == {"w00001": 3.0}


def test_parse_boost_body_goes_through_tokenizer():
    # the boosted body is tokenized like any query text (hyphenated
    # compounds stay one token, case folds, punctuation strips)
    terms, boosts = parse_query_boosted("Spark-SQL^2")
    assert terms == ["spark-sql"]
    assert boosts == {"spark-sql": 2.0}


def test_parse_boost_one_is_dropped_and_invalid_suffix_is_text():
    assert parse_query_boosted("spark^1") == (["spark"], {})
    # no valid numeric suffix -> plain text through the tokenizer,
    # which keeps '^' (only .,!? strip — reference semantics), so the
    # chunk stays one literal token exactly as the indexed side would
    terms, boosts = parse_query_boosted("spark^x2")
    assert terms == ["spark^x2"] and boosts == {}


def test_parse_zero_boost_rejected():
    with pytest.raises(ValueError):
        parse_query_boosted("spark^0")
    with pytest.raises(ValueError):
        parse_query_boosted("spark^0.0")


# ------------------------------------------------------------- scoring


def test_single_term_boost_scales_scores(tiny_index):
    base = _pairs(search_topk(tiny_index, "w00000", k=10))
    boosted = _pairs(search_topk(tiny_index, "w00000^2.5", k=10))
    assert [d for d, _ in boosted] == [d for d, _ in base]
    for (d0, s0), (d1, s1) in zip(base, boosted):
        assert s1 == pytest.approx(2.5 * s0, rel=1e-12)


def test_boost_reranks_multi_term(tiny_index):
    base = _pairs(search_topk(tiny_index, "w00000 w00200", k=20))
    boosted = _pairs(search_topk(tiny_index, "w00000 w00200^8", k=20))
    assert base != boosted  # the rare term now dominates


def test_boosted_scores_match_linear_combination(tiny_index):
    """score(q with boosts) == sum_t boost_t * score({t}) per doc."""
    qa, qb, wb = "w00000", "w00200", 3.0
    sa = dict(_pairs(search_topk(tiny_index, qa, k=1000)))
    sb = dict(_pairs(search_topk(tiny_index, qb, k=1000)))
    got = dict(_pairs(search_topk(tiny_index, f"{qa} {qb}^3", k=1000)))
    for d, s in got.items():
        want = sa.get(d, 0.0) + wb * sb.get(d, 0.0)
        assert s == pytest.approx(want, rel=1e-9)


@pytest.mark.parametrize("serving", ["driver", "spark"])
def test_boost_parity_across_serving(tiny_index, serving):
    ref = _pairs(search_topk(tiny_index, "w00000^2 w00010", k=15,
                             serving="driver"))
    got = _pairs(search_topk(tiny_index, "w00000^2 w00010", k=15,
                             serving=serving))
    assert got == ref


def test_boost_parity_wand_vs_dense(tiny_index):
    q = "w00000^2 w00200^0.5"
    d = _pairs(search_topk(tiny_index, q, k=15, mode="and", algorithm="dense"))
    w = _pairs(search_topk(tiny_index, q, k=15, mode="and", algorithm="wand"))
    assert d == w
    assert len(d) > 0


def test_boost_rows_path(tiny_index):
    rows = search_topk_rows(tiny_index, "w00000^2.5", k=10)
    df = _pairs(search_topk(tiny_index, "w00000^2.5", k=10, serving="spark"))
    assert [(int(d), float(s)) for d, s in rows] == df


def test_boost_and_mode_still_gates_absent_terms(tiny_index):
    assert search_topk(tiny_index, "w00000^2 zzznot", k=5, mode="and").count() == 0


def test_boost_batch_paths_match_single_query(tiny_index):
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_batch,
        search_topk_batch_rows,
    )

    queries = {"q0": "w00000^2 w00010", "q1": "w00200^0.5", "q2": "w00000"}
    singles = {
        qid: _pairs(search_topk(tiny_index, q, k=10))
        for qid, q in queries.items()
    }
    batch = search_topk_batch(tiny_index, queries, k=10).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    assert got == singles
    rows = search_topk_batch_rows(tiny_index, queries, k=10)
    assert {q: [(int(d), float(s)) for d, s in p] for q, p in rows.items()} \
        == singles
