"""spark-submit entrypoint: the whole crawl→serving pipeline, one job.

    jobs/pipeline.py --warc /crawl --workdir /idxroot \
        [--ingest-pipeline procs.json] [--url-dedup] [--redact-pii] \
        [--stopwords english --stem s --fold --cjk --positions] \
        [--n-buckets 64] [--alias live]

Steps (each an existing library operator — this CLI only composes):

1. WARC archives → documents (sources/warc.warc_to_documents);
2. optional ES-style ingest pipeline (operators/ingest.py);
3. optional curation: canonical-URL dedup, PII redaction;
4. dense doc_id assignment + index build (with the analyzer flags);
5. optional atomic alias flip (operators/aliases.py) — the new
   generation goes live under ``<workdir>/aliases.json`` and the
   PRIOR generation's dir is reported for retirement.

Each run builds into a fresh ``<workdir>/gen-<n>`` so a serving alias
never points at a half-built index. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warc", required=True, help="WARC archive dir")
    ap.add_argument("--workdir", required=True,
                    help="index root (generations + aliases.json)")
    ap.add_argument("--ingest-pipeline", help="JSON processor list file")
    ap.add_argument("--url-dedup", action="store_true")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--stopwords", default=None)
    ap.add_argument("--stem", default="none", choices=("none", "s", "porter"))
    ap.add_argument("--fold", action="store_true")
    ap.add_argument("--cjk", action="store_true")
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--alias", default=None,
                    help="flip this alias to the new generation")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.session import get_spark
    from hadoop_search_engine_spark.sources.warc import warc_to_documents

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-pipeline")
    t0 = time.time()
    counts: dict[str, int] = {}

    docs = warc_to_documents(spark, args.warc)
    if args.ingest_pipeline:
        from hadoop_search_engine_spark.operators.ingest import apply_pipeline

        with open(args.ingest_pipeline) as f:
            docs = apply_pipeline(docs, json.load(f))
    docs = assign_doc_ids(docs).persist()
    counts["ingested"] = docs.count()

    if args.url_dedup:
        from hadoop_search_engine_spark.operators.urltools import url_dedup

        docs = url_dedup(docs).persist()
        counts["after_url_dedup"] = docs.count()
    if args.redact_pii:
        from hadoop_search_engine_spark.operators.text_analysis import (
            redact_pii,
        )

        docs = redact_pii(docs)

    if args.stopwords is None:
        stopwords: tuple = ()
    elif args.stopwords == "english":
        from hadoop_search_engine_spark.functions.analyzer import (
            ENGLISH_STOPWORDS,
        )

        stopwords = ENGLISH_STOPWORDS
    else:
        stopwords = tuple(w for w in args.stopwords.split(",") if w)

    os.makedirs(args.workdir, exist_ok=True)
    gen = 0
    while os.path.exists(os.path.join(args.workdir, f"gen-{gen}")):
        gen += 1
    out_dir = os.path.join(args.workdir, f"gen-{gen}")

    stats = build_index(
        spark,
        docs.select("doc_id", "text"),
        out_dir,
        n_buckets=args.n_buckets,
        positions=args.positions,
        stopwords=stopwords,
        stem=args.stem,
        fold=args.fold,
        cjk=args.cjk,
    )

    prior: list[str] = []
    if args.alias:
        from hadoop_search_engine_spark.operators.aliases import set_alias

        prior = set_alias(args.workdir, args.alias, out_dir)

    print(json.dumps({
        "index": out_dir,
        "generation": gen,
        "n_docs": stats.n_docs,
        "avgdl": round(stats.avgdl, 3),
        "counts": counts,
        "alias": args.alias,
        "retired_generation": prior,
        "wall_sec": round(time.time() - t0, 2),
    }))
    if owns:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
