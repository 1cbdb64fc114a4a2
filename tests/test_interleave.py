"""Slot-balanced interleaving + click crediting: the declared slot
contract replayed in python, the disjoint-runs == classic-alternation
identity, and the credit counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.evaluate import (
    balanced_interleave,
    interleave_credit,
)


def _run(spark, name, ranking):
    rows = [(q, d, i + 1)
            for q, docs in ranking.items()
            for i, d in enumerate(docs)]
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank int"
    )


def _py_slots(a, b):
    slots = {}
    for i, d in enumerate(a):
        slots[d] = (2 * i, "a")
    for i, d in enumerate(b):
        s = 2 * i + 1
        if d not in slots or s < slots[d][0]:
            slots[d] = (s, "b")
    return [
        (r + 1, d, t)
        for r, (d, (s, t)) in enumerate(
            sorted(slots.items(), key=lambda kv: kv[1][0])
        )
    ]


def test_interleave_matches_slot_contract(spark):
    a = {"q1": [10, 11, 12, 13], "q2": [20, 21]}
    b = {"q1": [11, 14, 10, 15], "q2": [22, 20]}
    got = balanced_interleave(_run(spark, "a", a), _run(spark, "b", b))
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["team"])
        )
    for q in a:
        assert sorted(by_q[q]) == _py_slots(a[q], b[q])


def test_interleave_disjoint_is_strict_alternation(spark):
    a = {"q": [1, 2, 3]}
    b = {"q": [4, 5, 6]}
    got = sorted(
        (r["rank"], r["doc_id"], r["team"])
        for r in balanced_interleave(
            _run(spark, "a", a), _run(spark, "b", b)).collect()
    )
    assert got == [(1, 1, "a"), (2, 4, "b"), (3, 2, "a"),
                   (4, 5, "b"), (5, 3, "a"), (6, 6, "b")]
    # k truncates per query
    assert balanced_interleave(
        _run(spark, "a", a), _run(spark, "b", b), k=3).count() == 3


def test_interleave_credit_counts_and_winner(spark):
    a = {"q": [1, 2, 3]}
    b = {"q": [4, 5, 6]}
    il = balanced_interleave(_run(spark, "a", a), _run(spark, "b", b))
    clicks = spark.createDataFrame(
        [("q", 1), ("q", 4), ("q", 2), ("q", 99)],  # 99: outside list
        "query_id string, doc_id long",
    )
    r = interleave_credit(il, clicks).collect()[0]
    assert (r["clicks_a"], r["clicks_b"], r["winner"]) == (2, 1, "a")
    # tie case
    clicks_t = spark.createDataFrame(
        [("q", 1), ("q", 4)], "query_id string, doc_id long")
    assert interleave_credit(il, clicks_t).collect()[0]["winner"] == "tie"
