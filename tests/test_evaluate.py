"""Ranking-metric operator vs hand-computed TREC definitions."""

from __future__ import annotations

import math

import pytest

from hadoop_search_engine_spark.operators.evaluate import (
    evaluate_ranking,
    mean_metrics,
    run_from_batch,
)

# run: q1 ranks docs 10,11,12,13 ; q2 ranks 20,21 ; q3 ranks 30
RUN = [
    ("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q1", 13, 4),
    ("q2", 20, 1), ("q2", 21, 2),
    ("q3", 30, 1),
]
# qrels: q1 has rel docs 11 (rel 2), 13 (rel 1), 99 (rel 3, never
# retrieved); q2 has none relevant among retrieved but one judged 0;
# q3's only rel doc IS rank 1. q4 judged but never run -> 0 row.
QRELS = [
    ("q1", 11, 2), ("q1", 13, 1), ("q1", 99, 3), ("q1", 10, 0),
    ("q2", 20, 0), ("q2", 77, 1),
    ("q3", 30, 2),
    ("q4", 40, 1),
    # judged but NOTHING relevant: must still emit a zero-metrics row
    ("q5", 50, 0), ("q5", 51, 0),
]


def _dcg(pairs):
    return sum((2 ** r - 1) / math.log2(i + 1) for i, r in pairs)


@pytest.fixture(scope="module")
def metrics(spark):
    run = spark.createDataFrame(RUN, "query_id string, doc_id long, rank int")
    qrels = spark.createDataFrame(QRELS, "query_id string, doc_id long, rel int")
    rows = evaluate_ranking(run, qrels, k=3).collect()
    return {r["query_id"]: r for r in rows}


def test_ndcg_hand_computed(metrics):
    # q1 top-3: ranks 1(10,rel0) 2(11,rel2) 3(12,rel0) -> DCG = 3/log2(3)
    dcg = _dcg([(2, 2)])
    # ideal: rels sorted desc = [3,2,1] at ranks 1..3
    idcg = _dcg([(1, 3), (2, 2), (3, 1)])
    assert metrics["q1"]["ndcg"] == pytest.approx(round(dcg / idcg, 6))
    assert metrics["q3"]["ndcg"] == pytest.approx(1.0)
    assert metrics["q2"]["ndcg"] == 0.0


def test_mrr_precision_recall(metrics):
    assert metrics["q1"]["mrr"] == pytest.approx(0.5)      # first rel at rank 2
    assert metrics["q1"]["precision"] == pytest.approx(round(1 / 3, 6))
    assert metrics["q1"]["recall"] == pytest.approx(round(1 / 3, 6))  # 1 of 3 rels
    assert metrics["q1"]["n_rel"] == 3 and metrics["q1"]["n_rel_ret"] == 1
    assert metrics["q2"]["mrr"] == 0.0 and metrics["q2"]["n_rel_ret"] == 0
    assert metrics["q3"]["recall"] == pytest.approx(1.0)


def test_unrun_judged_query_scores_zero(metrics):
    assert metrics["q4"]["ndcg"] == 0.0
    assert metrics["q4"]["n_rel"] == 1 and metrics["q4"]["n_rel_ret"] == 0


def test_all_zero_rel_query_emits_zero_row(metrics):
    """A judged query whose judgments are all rel=0 stays on the board
    with zero metrics (dropping it would inflate the macro means)."""
    assert "q5" in metrics
    r = metrics["q5"]
    assert (r["n_rel"], r["n_rel_ret"], r["ndcg"], r["mrr"],
            r["recall"]) == (0, 0, 0.0, 0.0, 0.0)


def test_mean_metrics(spark, metrics):
    run = spark.createDataFrame(RUN, "query_id string, doc_id long, rank int")
    qrels = spark.createDataFrame(QRELS, "query_id string, doc_id long, rel int")
    m = mean_metrics(evaluate_ranking(run, qrels, k=3)).collect()[0]
    per = list(metrics.values())
    assert m["n_queries"] == 5
    assert m["mean_ndcg"] == pytest.approx(
        round(sum(r["ndcg"] for r in per) / 5, 6)
    )


def test_run_from_batch_rank_order(spark):
    batch = spark.createDataFrame(
        [("a", 5, 2.0), ("a", 3, 2.0), ("a", 9, 9.0), ("b", 1, 0.5)],
        "query_id string, doc_id long, score double",
    )
    got = {(r["query_id"], r["doc_id"]): r["rank"]
           for r in run_from_batch(batch).collect()}
    # score desc, doc_id asc on ties
    assert got == {("a", 9): 1, ("a", 3): 2, ("a", 5): 3, ("b", 1): 1}


def test_end_to_end_with_real_index(spark, tmp_path_factory):
    """Self-consistency: judging the engine's own top-1 per query as
    relevant yields perfect metrics at k=1."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk_batch,
    )

    rows = [(i, f"alpha {'beta ' * (i % 3)}gamma w{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("eidx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=8)
    idx = Index.load(spark, out)
    queries = {"qa": "alpha beta", "qb": "gamma w3"}
    batch = search_topk_batch(idx, queries, k=5)
    run = run_from_batch(batch)
    qrels = spark.createDataFrame(
        [(r["query_id"], r["doc_id"], 1)
         for r in run.where("rank = 1").collect()],
        "query_id string, doc_id long, rel int",
    )
    per = evaluate_ranking(run, qrels, k=1).collect()
    assert per and all(
        r["ndcg"] == 1.0 and r["mrr"] == 1.0 and r["recall"] == 1.0
        for r in per
    )
