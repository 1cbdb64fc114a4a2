"""spark-submit entrypoint: web-graph extraction + PageRank.

    jobs/graph.py --documents docs.parquet --output ranks.parquet \
                  [--iters 5] [--damping 85] [--edges-out edges.parquet]

Reads an input_hint-shaped documents table (url, html, + doc_id if
present), extracts the href link graph (operators/urltools.py
extract_links — JVM regex, map-only), resolves url edges to doc_id
edges, runs the fixed-point integer PageRank (operators/graph.py),
and writes (doc_id, rank) parquet — the link-authority feature an LTR
model or a function_score boost consumes. Prints ONE JSON line with
counts and the top-10 ranked doc_ids.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True,
                    help="documents parquet with url + html columns")
    ap.add_argument("--output", required=True,
                    help="ranks parquet (doc_id, rank)")
    ap.add_argument("--edges-out", default=None,
                    help="also persist the doc_id edge list here")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--damping", type=int, default=85,
                    help="damping percent (integer, default 85)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.graph import pagerank
    from hadoop_search_engine_spark.operators.urltools import (
        extract_links,
        link_graph_ids,
    )
    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-graph")
    docs = spark.read.parquet(args.documents)
    for col in ("url", "html"):
        if col not in docs.columns:
            ap.error(f"documents table lacks the {col!r} column")
    if "doc_id" not in docs.columns:
        docs = assign_doc_ids(docs)

    edges_url = extract_links(docs)
    edges = link_graph_ids(edges_url, docs).persist()
    n_edges = edges.count()
    if args.edges_out:
        edges.write.mode("overwrite").parquet(args.edges_out)

    ranks = pagerank(edges, n_iters=args.iters, damping_pct=args.damping)
    ranks.select(
        F.col("node").alias("doc_id"), F.col("rank_units")
    ).write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    top = out.orderBy(F.desc("rank_units"), F.asc("doc_id")).limit(10).collect()
    print(json.dumps({
        "n_docs": docs.count(),
        "n_edges": n_edges,
        "output": args.output,
        "top10": [[int(r["doc_id"]), int(r["rank_units"])] for r in top],
    }))
    if owns:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
