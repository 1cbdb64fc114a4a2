"""spark-submit entrypoint: build the inverted index from a documents table.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/build_index.py \
        --input /path/to/documents.parquet \
        --output /path/to/index \
        [--table catalog.db.documents]   # Iceberg table instead of a path
        [--n-buckets 64] [--waves 4] [--resume] [--num-shards N]

The input must have columns (url/doc_id, text, ...) per BASELINE.json
``input_hint``; when only ``url`` is present, dense doc_ids are minted
with :func:`assign_doc_ids` (deterministic in url, partitioning-
independent). ``--waves`` splits the build into sequential bucket
waves, each committing a checkpoint — a killed build restarts with
``--resume`` and rebuilds only the missing buckets. On a cluster, no
code change is needed: the same job string scales by ``--num-executors``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of the documents table")
    src.add_argument("--table", help="catalog table name (e.g. Iceberg) instead of a path")
    src.add_argument("--warc", help="directory of WARC archives (.warc/.warc.gz) "
                                    "to ingest as the corpus (sources/warc.py)")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--num-shards", type=int, default=None)
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--positions", action="store_true",
                    help="build a positional index (enables phrase search)")
    ap.add_argument("--stopwords", default=None,
                    help="'english' (Lucene classic list) or a comma-joined "
                         "custom list; default none")
    ap.add_argument("--stem", default="none", choices=("none", "s", "porter"))
    ap.add_argument("--fold", action="store_true",
                    help="ASCII-fold accented latin (ASCIIFoldingFilter)")
    ap.add_argument("--cjk", action="store_true",
                    help="bigram CJK runs (CJKAnalyzer semantics)")
    ap.add_argument("--ingest-pipeline",
                    help="JSON file with an ES-style processor list "
                         "(operators/ingest.py) applied to the documents "
                         "BEFORE doc_id assignment and indexing")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark import BLOCK_SIZE
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-build-index")
    if args.warc:
        from hadoop_search_engine_spark.sources.warc import warc_to_documents

        docs = warc_to_documents(spark, args.warc)
    elif args.table:
        docs = spark.table(args.table)
    else:
        docs = spark.read.parquet(args.input)
    if args.ingest_pipeline:
        from hadoop_search_engine_spark.operators.ingest import apply_pipeline

        with open(args.ingest_pipeline) as f:
            docs = apply_pipeline(docs, json.load(f))
    if "doc_id" not in docs.columns:
        docs = assign_doc_ids(docs)
    docs = docs.select("doc_id", "text")

    if args.stopwords is None:
        stopwords: tuple = ()
    elif args.stopwords == "english":
        from hadoop_search_engine_spark.functions.analyzer import (
            ENGLISH_STOPWORDS,
        )

        stopwords = ENGLISH_STOPWORDS
    else:
        stopwords = tuple(w for w in args.stopwords.split(",") if w)

    t0 = time.time()
    stats = build_index(
        spark,
        docs,
        args.output,
        num_shards=args.num_shards,
        n_buckets=args.n_buckets,
        block_size=args.block_size or BLOCK_SIZE,
        n_waves=args.waves,
        resume=args.resume,
        positions=args.positions,
        stopwords=stopwords,
        stem=args.stem,
        fold=args.fold,
        cjk=args.cjk,
    )
    wall = time.time() - t0
    print(json.dumps({
        "n_docs": stats.n_docs,
        "avgdl": round(stats.avgdl, 3),
        "num_shards": stats.num_shards,
        "n_buckets": stats.n_buckets,
        "build_sec": round(wall, 2),
        "docs_per_sec": round(stats.n_docs / wall, 1),
    }))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
