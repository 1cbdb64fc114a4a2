"""Ranking-quality evaluation: nDCG@k, MRR@k, precision/recall@k over
a run (query results) joined with relevance judgments (qrels).

The reference has no evaluation harness at all — results go straight
to the UI (client/src/utils/searchProcessor.ts renders the url list).
A production engine iterating on BM25 parameters, fusion weights, or
index analyzers needs exactly this: score a query set
(``search_topk_batch``), join the graded judgments, and read one
metrics row per query plus a corpus mean.

Shapes:
  * run:   ``(query_id, doc_id, rank)`` — rank 1 = best. Use
    :func:`run_from_batch` to derive ranks from a
    ``search_topk_batch`` result (its per-query order is the engine's
    total order (score desc, doc_id asc)).
  * qrels: ``(query_id, doc_id, rel)`` — graded relevance, rel > 0
    means relevant (binary metrics threshold at > 0).

Scale shape: one broadcast-or-shuffle equi-join of the k·|queries|-row
run against qrels on (query_id, doc_id), then a groupBy(query_id) —
both keyed, map-side combinable, no window over more than k rows, no
driver materialization. Ideal-DCG needs qrels-only aggregation (top-k
rels per query), computed with a per-query row_number window over the
qrels table — per-query cardinality, never corpus-wide.

All metrics use standard definitions (TREC eval):
  DCG@k  = Σ_{i<=k} (2^rel_i - 1) / log2(i + 1)
  nDCG@k = DCG@k / IDCG@k   (0 when a query has no relevant docs)
  MRR@k  = 1 / first-relevant-rank (0 if none in top k)
  P@k    = |relevant in top k| / k
  R@k    = |relevant in top k| / |relevant|
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def run_from_batch(batch: DataFrame) -> DataFrame:
    """Attach ranks to a ``search_topk_batch`` result
    (``query_id, doc_id, score``): rank = position in the engine's
    total order (score desc, doc_id asc). The window partitions by
    query_id over <= k rows per query."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return batch.select(
        "query_id", "doc_id", F.row_number().over(w).alias("rank")
    )


def evaluate_ranking(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query metrics ``(query_id, n_rel, n_rel_ret, ndcg, mrr,
    precision, recall)`` at cutoff ``k``; round to 6 dp (cross-engine
    comparable). Queries present in qrels but missing from the run
    score 0 (they were asked and nothing came back)."""
    run_k = run.where(F.col("rank") <= k)

    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / (
        F.log2(F.col("rank").cast("double") + 1.0)
    )
    hits = (
        run_k.join(qrels, ["query_id", "doc_id"])
        .where(F.col("rel") > 0)
        .select(
            "query_id",
            "rank",
            gain.alias("gain"),
            (1.0 / F.col("rank")).alias("rr"),
        )
    )
    per_q = hits.groupBy("query_id").agg(
        F.count("*").alias("n_rel_ret"),
        F.sum("gain").alias("dcg"),
        F.max("rr").alias("mrr"),  # max(1/rank) == 1/min(rank)
    )

    # ideal DCG: the query's top-k rels by (rel desc, doc_id asc)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        qrels.where(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(wq))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank").cast("double") + 1.0)
            ).alias("idcg")
        )
    )
    # base = EVERY judged query (a query whose judgments are all rel=0
    # still gets a zero-metrics row and counts in the macro means —
    # dropping it would silently inflate the averages)
    base = qrels.select("query_id").distinct()
    n_rel = (
        qrels.where(F.col("rel") > 0)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_rel"))
    )

    out = (
        base.join(n_rel, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("n_rel_ret", F.lit(0)).cast("long").alias("n_rel_ret"),
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)), 6
            ).alias("ndcg"),
            F.round(F.coalesce("mrr", F.lit(0.0)), 6).alias("mrr"),
            F.round(
                F.coalesce("n_rel_ret", F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision"),
            F.round(
                F.coalesce(
                    F.coalesce("n_rel_ret", F.lit(0)) / F.col("n_rel"),
                    F.lit(0.0),
                ),
                6,
            ).alias("recall"),
        )
    )
    return out


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """Corpus means of :func:`evaluate_ranking`'s per-query rows —
    the one-line scoreboard (macro-averaged over queries WITH
    judgments, TREC convention)."""
    return per_query.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
        F.round(F.avg("mrr"), 6).alias("mean_mrr"),
        F.round(F.avg("precision"), 6).alias("mean_precision"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
    )


def balanced_interleave(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """Slot-balanced interleaving of two ranked runs — the online A/B
    ranking experiment (Joachims 2002's evaluation setup): users see
    ONE merged list; clicks on docs contributed by A credit A, and
    vice versa.

    Deterministic slot-key formulation (the contract this operator
    DEFINES, chosen to be declarative and SQL-replayable): run A's
    docs occupy even slots ``2*(rank_a-1)``, run B's odd slots
    ``2*(rank_b-1)+1``; a doc in both runs takes its EARLIEST slot,
    the merged order is slot ascending, and ``team`` records which
    run supplied that earliest slot (ties cannot occur — even vs
    odd). For DISJOINT runs this is exactly Joachims' alternate
    construction with A first; when runs share docs it differs from
    the pointer-advancing variant (a doc freed by deduplication does
    NOT pull later docs forward past their slots) — both preserve
    the fairness property that matters: each team's i-th unique
    contribution can never be displaced behind the other team's
    (i+1)-th.

    Inputs: ``(query_id, doc_id, rank)`` frames (:func:`run_from_batch`
    shape). Output: ``(query_id, rank, doc_id, team)`` — merged rank
    1-based, team 'a' | 'b', top ``k`` per query (default: all).
    Per-query windows over <= |run_a|+|run_b| rows — k-bounded, never
    corpus-sized."""
    a = run_a.select(
        "query_id", "doc_id",
        (2 * (F.col("rank") - 1)).cast("long").alias("slot_a"),
    )
    b = run_b.select(
        "query_id", "doc_id",
        (2 * (F.col("rank") - 1) + 1).cast("long").alias("slot_b"),
    )
    j = a.join(b, ["query_id", "doc_id"], "full")
    slot = F.least(
        F.coalesce("slot_a", F.lit(1 << 62)),
        F.coalesce("slot_b", F.lit(1 << 62)),
    )
    team = F.when(
        F.coalesce("slot_a", F.lit(1 << 62)) < F.coalesce(
            "slot_b", F.lit(1 << 62)), F.lit("a")
    ).otherwise(F.lit("b"))
    w = Window.partitionBy("query_id").orderBy(F.asc("_slot"))
    out = (
        j.select("query_id", "doc_id", slot.alias("_slot"),
                 team.alias("team"))
        .withColumn("rank", F.row_number().over(w))
        .select("query_id", "rank", "doc_id", "team")
    )
    if k is not None:
        out = out.where(F.col("rank") <= int(k))
    return out


def interleave_credit(
    interleaved: DataFrame,
    clicks: DataFrame,
) -> DataFrame:
    """Score the interleaving experiment: per query, how many clicked
    docs each team contributed — ``(query_id, clicks_a, clicks_b,
    winner)`` with winner 'a' | 'b' | 'tie' (Joachims' h test counts).
    ``clicks`` is ``(query_id, doc_id)``; clicks on docs outside the
    interleaved list are ignored."""
    hit = interleaved.join(clicks.select("query_id", "doc_id").distinct(),
                           ["query_id", "doc_id"], "left_semi")
    counts = hit.groupBy("query_id").agg(
        F.sum(F.when(F.col("team") == "a", 1).otherwise(0))
        .cast("long").alias("clicks_a"),
        F.sum(F.when(F.col("team") == "b", 1).otherwise(0))
        .cast("long").alias("clicks_b"),
    )
    return counts.select(
        "query_id", "clicks_a", "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), "a")
        .when(F.col("clicks_b") > F.col("clicks_a"), "b")
        .otherwise("tie").alias("winner"),
    )
