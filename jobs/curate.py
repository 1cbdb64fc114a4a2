"""spark-submit entrypoint: curate a documents table for training.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/curate.py \
        --input /path/to/documents.parquet \
        --output /path/to/curated \
        [--min-tokens 5] [--max-tokens 100000] [--min-quality 0.3] \
        [--langs en,es] [--near-threshold 0.8]

Runs the standard web-corpus pipeline (operators/curate.py): optional
PII redaction (--redact-pii) and corpus-wide repeated-line removal
(--line-dedup drop_all:3) -> optional Gopher repetition filter
(--max-dup-ratio) -> annotate (token count, language id, quality
score, fingerprint) -> filter -> exact dedup (md5 digest groupBy) ->
near dedup (MinHash-LSH greedy drop) -> optional eval-set
decontamination (--decontaminate eval.parquet), deterministic
sampling (--sample 'en=0.2,*=0.5' --sample-by lang) and split
(--split), writes the surviving rows (original columns + annotations)
as parquet, and prints a one-line JSON lineage report (docs in/out,
surviving token volume). Scales like its stages: map-only annotation/
redaction passes, digest and line-hash shuffles, banded LSH equi-joins
— never an all-pairs comparison, never a driver-side corpus.
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
    ap.add_argument("--url-col", default="url",
                    help="URL column for the --url-* / --blocklist / "
                         "--cap-per-domain stages")
    ap.add_argument("--url-dedup", action="store_true",
                    help="canonical-URL dedup FIRST (normalize scheme/"
                         "host/port/params, lowest doc_id wins) — the "
                         "cheapest dedup, before any text work")
    ap.add_argument("--blocklist", default=None, metavar="PARQUET",
                    help="drop docs whose registrable domain appears in "
                         "this parquet (column: domain); broadcast "
                         "anti-join")
    ap.add_argument("--url-patterns", action="store_true",
                    help="drop docs whose URL matches the default "
                         "crawl-cleaning regex blocklist (search/tag/"
                         "login/feed/asset endpoints)")
    ap.add_argument("--cap-per-domain", type=int, default=None,
                    metavar="N",
                    help="keep <= N docs per registrable domain "
                         "(deterministic salted-murmur sample)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/IPv4s/phones before anything else "
                         "(map-only regexp_replace)")
    ap.add_argument("--line-dedup", default=None, metavar="MODE:MAXDF",
                    help="corpus-wide repeated-line removal before "
                         "filtering: 'drop_all:3' (C4) or "
                         "'keep_first:1' (CCNet); docs losing every "
                         "line are dropped")
    ap.add_argument("--span-dedup", type=int, default=None, metavar="N",
                    help="exact duplicate-SPAN removal (Lee et al. "
                         "2022): cut every token covered by a "
                         "non-first duplicate N-gram occurrence "
                         "corpus-wide (keep-first); docs losing every "
                         "token drop out")
    ap.add_argument("--max-dup-ratio", type=float, default=None,
                    help="drop docs whose within-doc bigram dup_ratio "
                         "exceeds this (Gopher repetition rule)")
    ap.add_argument("--decontaminate", default=None, metavar="EVAL_PARQUET",
                    help="drop curated docs sharing any n-gram with this "
                         "eval set (broadcast eval shingles)")
    ap.add_argument("--decon-ngram", type=int, default=8,
                    help="with --decontaminate: n-gram length")
    ap.add_argument("--sample", default=None,
                    help="deterministic keep-rate sampling after "
                         "curation: '0.1' (uniform) or per-stratum "
                         "'en=0.2,zh=1.0,*=0.5' with --sample-by")
    ap.add_argument("--sample-by", default=None,
                    help="with per-stratum --sample: the strata column")
    ap.add_argument("--sample-salt", default="sample")
    ap.add_argument("--token-budget", type=int, default=None, metavar="N",
                    help="after sampling: cut to the maximal salted-"
                         "murmur-order prefix fitting N tokens "
                         "(deterministic, nested across budgets)")
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="DSIR importance resampling: keep the "
                         "--dsir-k docs that look most like this "
                         "target corpus (hashed-ngram log-likelihood "
                         "ratio + deterministic Gumbel top-k)")
    ap.add_argument("--dsir-k", type=int, default=None,
                    help="docs to keep for --dsir-target")
    ap.add_argument("--dsir-temperature", type=float, default=1.0,
                    help="Gumbel temperature (0 = hard top-k by weight)")
    ap.add_argument("--dsir-features", type=int, default=None,
                    help="hashed feature buckets (default 2^16)")
    ap.add_argument("--classifier-weights", default=None,
                    metavar="PARQUET",
                    help="learned quality gate (GPT-3 style): keep "
                         "docs the trained hashed-ngram logistic "
                         "model (jobs/train classifier weights table) "
                         "scores >= --classifier-min-prob; runs after "
                         "the heuristic filter")
    ap.add_argument("--classifier-min-prob", type=float, default=0.5)
    ap.add_argument("--semdedup", default=None, metavar="EMB_PARQUET",
                    help="SemDeDup embedding near-dup removal: drop "
                         "curated docs whose vector (vec_id == "
                         "doc_id) has a lower-id neighbor at cosine "
                         ">= --semdedup-threshold (LSH-bucketed, "
                         "never all-pairs)")
    ap.add_argument("--semdedup-threshold", type=float, default=0.95)
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
    if (args.url_dedup or args.blocklist or args.cap_per_domain
            or args.url_patterns):
        from hadoop_search_engine_spark.operators import urltools

        if args.url_patterns:
            docs = urltools.url_pattern_filter(docs, url_col=args.url_col)
        if args.url_dedup:
            docs = urltools.url_dedup(docs, url_col=args.url_col).drop(
                "url_norm"
            )
        if args.blocklist:
            blocked = spark.read.parquet(args.blocklist)
            docs = urltools.blocklist_filter(
                docs, blocked, url_col=args.url_col
            )
        if args.cap_per_domain:
            docs = urltools.cap_per_domain(
                docs, args.cap_per_domain, url_col=args.url_col
            )
    if args.redact_pii:
        from hadoop_search_engine_spark.operators.text_analysis import (
            redact_pii,
        )

        docs = redact_pii(docs)
    if args.line_dedup:
        from hadoop_search_engine_spark.operators.curate import dedup_lines

        mode, _, maxdf = args.line_dedup.partition(":")
        rebuilt = dedup_lines(
            docs, max_line_df=int(maxdf or 1), mode=mode
        )
        docs = docs.drop("text").join(rebuilt, "doc_id")
    if args.span_dedup:
        from hadoop_search_engine_spark.operators.dedup import (
            drop_duplicate_spans,
        )

        rebuilt = drop_duplicate_spans(docs, n=args.span_dedup)
        docs = docs.drop("text").join(rebuilt, "doc_id")
    if args.max_dup_ratio is not None:
        from hadoop_search_engine_spark.operators.text_analysis import (
            repetition_filter,
        )

        docs = repetition_filter(docs, max_dup_ratio=args.max_dup_ratio)
    curated = curate_corpus(
        docs,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        langs=tuple(s for s in args.langs.split(",") if s),
        near_threshold=args.near_threshold,
    ).persist()
    if args.classifier_weights:
        from hadoop_search_engine_spark.operators.classifier import (
            classifier_filter,
        )

        weights = spark.read.parquet(args.classifier_weights)
        curated = classifier_filter(
            curated, weights, min_prob=args.classifier_min_prob
        )
    if args.semdedup:
        from pyspark.sql import functions as F

        from hadoop_search_engine_spark.operators.similarity import semdedup

        emb = spark.read.parquet(args.semdedup)
        kept_vecs = semdedup(
            emb, threshold=args.semdedup_threshold
        ).select(F.col("vec_id").alias("doc_id"))
        # docs WITH a vector keep only semdedup survivors; docs
        # without one pass through (no evidence to drop on)
        has_vec = emb.select(F.col("vec_id").alias("doc_id"))
        curated = curated.join(
            has_vec.join(kept_vecs, "doc_id", "left_anti"),
            "doc_id", "left_anti",
        )
    if args.decontaminate:
        from hadoop_search_engine_spark.operators.curate import decontaminate

        evald = spark.read.parquet(args.decontaminate)
        curated = decontaminate(curated, evald, n=args.decon_ngram)
    if args.dsir_target:
        from hadoop_search_engine_spark.operators import dsir

        if not args.dsir_k:
            ap.error("--dsir-target needs --dsir-k")
        tgt = spark.read.parquet(args.dsir_target)
        kw = {}
        if args.dsir_features:
            kw["n_features"] = args.dsir_features
        curated = dsir.dsir_select(
            curated, tgt, k=args.dsir_k,
            temperature=args.dsir_temperature, **kw,
        ).drop("dsir_llq", "key_llq")
    if args.sample:
        from hadoop_search_engine_spark.operators.curate import (
            stratified_sample,
        )

        if "=" in args.sample:
            rates: dict[str, float] = {}
            default = 0.0
            for part in args.sample.split(","):
                key, _, val = part.partition("=")
                if key == "*":
                    default = float(val)
                else:
                    rates[key] = float(val)
            if not args.sample_by:
                ap.error("per-stratum --sample needs --sample-by")
            curated = stratified_sample(
                curated, rates, strata_col=args.sample_by,
                default_rate=default, salt=args.sample_salt,
            )
        else:
            curated = stratified_sample(
                curated, float(args.sample), salt=args.sample_salt
            )
    if args.token_budget is not None:
        from hadoop_search_engine_spark.operators.curate import (
            token_budget_cut,
        )

        curated = token_budget_cut(curated, args.token_budget)
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
