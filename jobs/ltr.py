"""spark-submit entrypoint: learning-to-rank train / rerank.

    # extract features + fit the pointwise model, save it as JSON
    jobs/ltr.py --index IDX --queries q.json --qrels qrels.parquet \
        --documents docs.parquet --doc-features quality,n_chars \
        --train-out model.json

    # rerank queries with a saved model (writes a run parquet)
    jobs/ltr.py --index IDX --queries q.json --model model.json \
        --documents docs.parquet --doc-features quality,n_chars \
        --rerank-out run.parquet --k 10

``--queries`` is a JSON object {query_id: query_text}; qrels parquet
carries (query_id, doc_id, rel). With both --train-out and
--rerank-out the freshly trained model reranks in the same job and an
ndcg comparison vs plain BM25 is printed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True,
                    help="JSON file {query_id: query_text}")
    ap.add_argument("--documents", help="documents parquet (doc features)")
    ap.add_argument("--doc-features", default="",
                    help="comma-joined documents columns to use as features")
    ap.add_argument("--qrels", help="qrels parquet (query_id, doc_id, rel)")
    ap.add_argument("--train-out", help="write the fitted model JSON here")
    ap.add_argument("--model", help="load a model JSON instead of training")
    ap.add_argument("--rerank-out", help="write the reranked run parquet")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.5)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.ltr import (
        ltr_features,
        ltr_rerank,
        train_ltr,
    )
    from hadoop_search_engine_spark.operators.query_exec import Index
    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-ltr")
    idx = Index.load(spark, args.index)
    with open(args.queries) as f:
        queries = {str(k): str(v) for k, v in json.load(f).items()}
    doc_cols = tuple(c for c in args.doc_features.split(",") if c)
    documents = spark.read.parquet(args.documents) if args.documents else None

    feats = ltr_features(
        idx, queries, documents=documents, doc_feature_cols=doc_cols
    ).persist()
    feature_cols = ("bm25", "n_query_terms") + doc_cols
    out: dict = {"n_feature_rows": feats.count(),
                 "feature_cols": list(feature_cols)}

    model = None
    if args.train_out:
        if not args.qrels:
            ap.error("--train-out needs --qrels")
        qrels = spark.read.parquet(args.qrels)
        model = train_ltr(feats, qrels, feature_cols,
                          lr=args.lr, n_iters=args.iters)
        with open(args.train_out, "w") as f:
            json.dump(model, f)
        out["model"] = args.train_out
    elif args.model:
        with open(args.model) as f:
            model = json.load(f)

    if args.rerank_out:
        if model is None:
            ap.error("--rerank-out needs --model or --train-out")
        run = ltr_rerank(feats, model, k=args.k)
        run.write.mode("overwrite").parquet(args.rerank_out)
        out["run"] = args.rerank_out
        if args.qrels:
            from pyspark.sql import Window

            from hadoop_search_engine_spark.operators.evaluate import (
                evaluate_ranking,
            )

            qrels = spark.read.parquet(args.qrels)
            ltr_ndcg = (
                evaluate_ranking(
                    run.select("query_id", "doc_id", "rank"), qrels,
                    k=args.k,
                ).agg(F.avg("ndcg")).collect()[0][0]
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("bm25"), F.asc("doc_id"))
            bm = (
                feats.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= args.k)
                .select("query_id", "doc_id", "rank")
            )
            bm_ndcg = (
                evaluate_ranking(bm, qrels, k=args.k)
                .agg(F.avg("ndcg")).collect()[0][0]
            )
            out["ndcg_ltr"] = round(float(ltr_ndcg or 0.0), 6)
            out["ndcg_bm25"] = round(float(bm_ndcg or 0.0), 6)

    print(json.dumps(out))
    if owns:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
