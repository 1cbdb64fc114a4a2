"""spark-submit entrypoint: percolation — match documents against a
registered query set (reverse search; ES percolator shape).

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/percolate.py --documents /data/documents.parquet \
        --queries-file saved_searches.json [--out /data/hits.parquet]

``saved_searches.json`` is a list of
``{"query_id": ..., "query_text": ..., "mode": "or"|"and",
"min_match": M}`` (mode/min_match optional). For registries past
driver size, ``--registry compiled.parquet`` takes a pre-compiled
``(query_id, term, n_required)`` table instead (see
operators/percolate.py compile_queries). Output is
``(doc_id, query_id, n_matched)`` — written to ``--out`` as parquet,
or shown on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True,
                    help="documents parquet (doc_id, text)")
    ap.add_argument("--queries-file",
                    help="JSON list of registered queries")
    ap.add_argument("--registry",
                    help="compiled (query_id, term, n_required) parquet "
                         "for registries past driver size")
    ap.add_argument("--synonyms-file",
                    help="JSON {surface: canonical} synonym map")
    ap.add_argument("--out", help="output parquet path (default: show)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args(argv)

    if bool(args.queries_file) == bool(args.registry):
        ap.error("exactly one of --queries-file / --registry is required")

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators.percolate import percolate
    from hadoop_search_engine_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-percolate")
    docs = spark.read.parquet(args.documents)
    synonyms = None
    if args.synonyms_file:
        with open(args.synonyms_file) as fh:
            synonyms = json.load(fh)
    if args.registry:
        queries = spark.read.parquet(args.registry)
    else:
        with open(args.queries_file) as fh:
            queries = json.load(fh)
    hits = percolate(docs, queries, synonyms,
                     id_col=args.id_col, text_col=args.text_col)
    if args.out:
        hits.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        hits.orderBy("doc_id", "query_id").show(100, truncate=80)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
