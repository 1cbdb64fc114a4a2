"""spark-submit entrypoint: curate a documents table for training.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/curate.py \
        --input /path/to/documents.parquet \
        --output /path/to/curated \
        [--min-tokens 5] [--max-tokens 100000] [--min-quality 0.3] \
        [--langs en,es] [--near-threshold 0.8]

Runs the standard web-corpus pipeline (operators/curate.py): annotate
(token count, language id, quality score, fingerprint) -> filter ->
exact dedup (md5 digest groupBy) -> near dedup (MinHash-LSH greedy
drop), writes the surviving rows (original columns + annotations) as
parquet, and prints a one-line JSON lineage report (docs in/out,
surviving token volume). Scales like its stages: one map-only
annotation pass, a digest shuffle, and banded LSH equi-joins — never
an all-pairs comparison, never a driver-side corpus.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="curated parquet path")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default="en,es",
                    help="comma-separated lang_pred allowlist")
    ap.add_argument("--near-threshold", type=float, default=0.8,
                    help="minhash est-Jaccard near-dup threshold")
    ap.add_argument("--split", default=None,
                    help="add a deterministic train/val/test column: "
                         "'train:0.9,val:0.05,test:0.05' (salted murmur3 "
                         "of doc_id — stable across reruns/partitioning/"
                         "engines, unlike randomSplit)")
    ap.add_argument("--split-salt", default="split",
                    help="with --split: salt for the hash assignment")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators.curate import (
        curate_corpus,
        curation_report,
    )
    from hadoop_search_engine_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-curate")
    docs = spark.read.parquet(args.input)
    curated = curate_corpus(
        docs,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        langs=tuple(s for s in args.langs.split(",") if s),
        near_threshold=args.near_threshold,
    ).persist()
    if args.split:
        from hadoop_search_engine_spark.operators.curate import split_corpus

        splits = tuple(
            (name, float(w))
            for name, w in (p.split(":", 1) for p in args.split.split(","))
        )
        curated = split_corpus(curated, splits=splits, salt=args.split_salt)
    curated.write.mode("overwrite").parquet(args.output)
    report = curation_report(docs, curated)
    report["output"] = args.output
    print(json.dumps(report))
    curated.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
