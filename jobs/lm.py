"""spark-submit entrypoint: corpus language model — train, score,
filter, suggest.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/lm.py --input docs.parquet --train LM_DIR
    ... --input docs.parquet [--lm LM_DIR] --score OUT_PARQUET
    ... --input docs.parquet [--lm LM_DIR] --filter LO:HI --output DIR
    ... --input docs.parquet [--lm LM_DIR] --suggest "qery text"

* ``--train LM_DIR``: write unigram/bigram count tables (the
  CCNet-style reference-LM artifact, trained once and reused).
* ``--score OUT``: per-doc Stupid-Backoff perplexity parquet
  ``(doc_id, n_tokens, sum_llq, ppl)``; with ``--lm`` scores under the
  external LM, else self-trained.
* ``--filter LO:HI --output DIR``: keep docs with ppl in [LO, HI]
  (CCNet band cut; token-less docs pass) and write them out.
* ``--suggest QUERY``: "did you mean" phrase suggestions (one JSON
  line), bigram-LM + noisy-channel scored.

Each action prints one JSON receipt line.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--lm", default=None, metavar="LM_DIR")
    ap.add_argument("--train", default=None, metavar="LM_DIR")
    ap.add_argument("--score", default=None, metavar="OUT_PARQUET")
    ap.add_argument("--filter", default=None, metavar="LO:HI")
    ap.add_argument("--output", default=None)
    ap.add_argument("--suggest", default=None, metavar="QUERY")
    ap.add_argument("--max-edits", type=int, default=1)
    ap.add_argument("--per-token", type=int, default=5)
    ap.add_argument("--topn", type=int, default=3)
    args = ap.parse_args(argv)
    if not (args.train or args.score or args.filter or args.suggest):
        ap.error("request at least one of --train/--score/--filter/--suggest")
    if args.filter and not args.output:
        ap.error("--filter needs --output")

    from hadoop_search_engine_spark.operators import lm as L
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(app_name="hse-lm")
    docs = spark.read.parquet(args.input)

    if args.train:
        uni, big = L.train_lm(docs)
        L.write_lm(uni, big, args.train)
        print(json.dumps({
            "action": "train", "lm_dir": args.train,
            "vocab": uni.count(), "bigrams": big.count(),
        }))

    lm_src = args.lm or args.train
    uni = big = None
    if lm_src:
        uni, big = L.read_lm(spark, lm_src)

    if args.score:
        ppl = L.doc_perplexity(docs, uni, big)
        ppl.write.mode("overwrite").parquet(args.score)
        print(json.dumps({
            "action": "score", "out": args.score, "docs": docs.count(),
        }))
    if args.filter:
        lo_s, _, hi_s = args.filter.partition(":")
        lo, hi = float(lo_s or 0.0), float(hi_s or "inf")
        kept = L.perplexity_filter(docs, max_ppl=hi, min_ppl=lo,
                                   unigrams=uni, bigrams=big)
        kept.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "action": "filter", "band": [lo, hi], "out": args.output,
            "kept": spark.read.parquet(args.output).count(),
            "total": docs.count(),
        }))
    if args.suggest:
        if uni is None:
            uni, big = L.train_lm(docs)
        rows = L.suggest_phrase(
            spark, args.suggest, uni, big,
            max_edits=args.max_edits, per_token=args.per_token,
            topn=args.topn,
        ).collect()
        print(json.dumps({
            "action": "suggest", "query": args.suggest,
            "suggestions": [
                {"text": r["suggestion"], "score": r["score"]} for r in rows
            ],
        }))


if __name__ == "__main__":
    main()
