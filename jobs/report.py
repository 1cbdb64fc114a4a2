"""spark-submit entrypoint: corpus reports for a documents table.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/report.py --input /path/to/documents.parquet \
        [--mix lang,source] [--pii] [--repetition] [--contamination EVAL]

Prints one JSON line per requested report:
  * ``--mix col[,col...]``: data-mix rows (docs/tokens/quality +
    corpus shares per group, operators/text_analysis.corpus_mix_report)
  * ``--pii``: one-row PII census (match + affected-doc counts)
  * ``--repetition``: within-doc bigram dup_ratio summary
    (mean / p95 / docs over 0.3)
  * ``--contamination EVAL_PARQUET [--ngram 8]``: how much of the
    corpus shares n-grams with the eval set
  * ``--timeline COL[:INTERVAL]``: docs per calendar bucket of a
    timestamp column (ES date_histogram; INTERVAL one of minute/hour/
    day/week/month/quarter/year, default week; empty interior
    buckets included)

All map-only or single-aggregation passes; output is group-sized.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--mix", default=None, metavar="COLS")
    ap.add_argument("--pii", action="store_true")
    ap.add_argument("--repetition", action="store_true")
    ap.add_argument("--contamination", default=None, metavar="EVAL")
    ap.add_argument("--ngram", type=int, default=8)
    ap.add_argument("--timeline", default=None, metavar="COL[:INTERVAL]")
    args = ap.parse_args(argv)
    if not (args.mix or args.pii or args.repetition or args.contamination
            or args.timeline):
        ap.error("request at least one report")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.session import get_spark

    owns = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-report")
    docs = spark.read.parquet(args.input)

    if args.mix:
        from hadoop_search_engine_spark.operators.text_analysis import (
            corpus_mix_report,
        )

        cols = tuple(c for c in args.mix.split(",") if c)
        rows = corpus_mix_report(docs, by=cols).collect()
        print(json.dumps({
            "report": "mix", "by": list(cols),
            "groups": [r.asDict() for r in rows],
        }))
    if args.pii:
        from hadoop_search_engine_spark.operators.text_analysis import (
            pii_counts,
        )

        row = pii_counts(docs).collect()[0]
        print(json.dumps({"report": "pii", **row.asDict()}))
    if args.repetition:
        from hadoop_search_engine_spark.operators.text_analysis import (
            repetition_stats,
        )

        rep = repetition_stats(docs)
        row = rep.agg(
            F.round(F.avg("dup_ratio"), 6).alias("mean"),
            F.round(F.percentile_approx("dup_ratio", 0.95), 6).alias("p95"),
            F.sum((F.col("dup_ratio") > 0.3).cast("long")).alias(
                "docs_over_0_3"
            ),
            F.count("*").alias("n_docs"),
        ).collect()[0]
        print(json.dumps({"report": "repetition", **row.asDict()}))
    if args.contamination:
        from hadoop_search_engine_spark.operators.curate import (
            contamination_report,
        )

        evald = spark.read.parquet(args.contamination)
        rep = contamination_report(docs, evald, n=args.ngram)
        row = rep.agg(
            F.count("*").alias("contaminated_docs"),
            F.round(F.avg("rate"), 6).alias("mean_rate"),
        ).collect()[0]
        n = docs.count()
        print(json.dumps({
            "report": "contamination", "ngram": args.ngram,
            "corpus_docs": n, **row.asDict(),
        }))
    if args.timeline:
        from hadoop_search_engine_spark.operators.analytics import (
            date_histogram,
        )

        col, _, interval = args.timeline.partition(":")
        rows = (
            date_histogram(docs, col, interval or "week", min_doc_count=0)
            .orderBy("bucket")
            .collect()
        )
        print(json.dumps({
            "report": "timeline", "col": col,
            "interval": interval or "week",
            "buckets": [
                {"bucket": r["bucket"].isoformat(), "n_docs": r["n_docs"]}
                for r in rows
            ],
        }))
    if owns:
        spark.stop()


if __name__ == "__main__":
    main()
