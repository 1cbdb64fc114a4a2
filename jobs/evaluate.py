"""spark-submit entrypoint: relevance evaluation of the engine against
graded judgments.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/evaluate.py --index /path/to/index \
        --queries-file queries.json --qrels /path/qrels.parquet [--k 10]

``queries.json`` is ``{query_id: query_text}`` (the batch-serving
shape); ``qrels`` is a parquet table ``(query_id string, doc_id long,
rel int)`` with graded relevance (rel > 0 = relevant). The whole query
set is served in ONE batch pass (search_topk_batch), ranked, joined
with the qrels, and scored: per-query nDCG@k / MRR@k / P@k / R@k plus
the macro-averaged means (TREC conventions; see operators/evaluate.py).

Alternatively ``--run run.parquet`` evaluates a pre-computed run
``(query_id, doc_id, rank)`` (or ``score`` — ranks derived) without
touching an index: the offline A/B shape for comparing engines.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", help="index dir (serve + evaluate)")
    ap.add_argument("--queries-file",
                    help="JSON {query_id: query_text} (with --index)")
    ap.add_argument("--run",
                    help="pre-computed run parquet (query_id, doc_id, "
                         "rank|score) — evaluate without serving")
    ap.add_argument("--interleave", default=None, metavar="RUN_B",
                    help="with --run: slot-balanced-interleave the two "
                         "runs (online A/B merge) and print the merged "
                         "list as JSON lines; with --clicks also print "
                         "the per-query credit report")
    ap.add_argument("--clicks", default=None, metavar="PARQUET",
                    help="with --interleave: (query_id, doc_id) click "
                         "log for the credit report")
    ap.add_argument("--qrels", required=False,
                    help="qrels parquet (query_id, doc_id, rel)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and"], default="or")
    args = ap.parse_args(argv)

    if bool(args.index) == bool(args.run):
        ap.error("exactly one of --index / --run is required")
    if args.index and not args.queries_file:
        ap.error("--index needs --queries-file")
    if args.interleave and not args.run:
        ap.error("--interleave composes with --run (two offline runs)")
    if not args.interleave and not args.qrels:
        ap.error("--qrels is required (except with --interleave)")

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators.evaluate import (
        evaluate_ranking,
        mean_metrics,
        run_from_batch,
    )
    from hadoop_search_engine_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-evaluate")

    if args.index:
        from hadoop_search_engine_spark.operators.query_exec import (
            Index,
            search_topk_batch,
        )

        with open(args.queries_file) as fh:
            queries = json.load(fh)
        idx = Index.load(spark, args.index)
        run = run_from_batch(
            search_topk_batch(idx, queries, k=args.k, mode=args.mode)
        )
    else:
        run = spark.read.parquet(args.run)
        if "rank" not in run.columns:
            run = run_from_batch(run)

    if args.interleave:
        from hadoop_search_engine_spark.operators.evaluate import (
            balanced_interleave,
            interleave_credit,
        )

        run_b = spark.read.parquet(args.interleave)
        if "rank" not in run_b.columns:
            run_b = run_from_batch(run_b)
        merged = balanced_interleave(run, run_b, k=args.k).persist()
        for r in merged.orderBy("query_id", "rank").collect():
            print(json.dumps(r.asDict()))
        if args.clicks:
            clicks = spark.read.parquet(args.clicks)
            for r in interleave_credit(merged, clicks).orderBy(
                    "query_id").collect():
                print(json.dumps(r.asDict()))
        if owns_session:
            spark.stop()
        return

    qrels = spark.read.parquet(args.qrels)
    per_q = evaluate_ranking(run, qrels, k=args.k).persist()
    per_q.orderBy("query_id").show(1000, truncate=40)
    mean_metrics(per_q).show(truncate=40)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
