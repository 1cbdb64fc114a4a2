"""spark-submit entrypoint: turn a curated corpus into training rows.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/train_prep.py \
        --input /path/to/curated.parquet \
        --output /path/to/packed \
        --pack 2048 \
        [--mix 'en=1.5,*=1.0' --mix-by lang] \
        [--bpe-train 200 --bpe-merges-out merges.parquet | \
         --bpe-merges merges.parquet] \
        [--spans-out spans.parquet] \
        [--chunk '512:64' instead of --pack]

The last mile of the pipeline (operators/training.py, bpe.py,
curate.mix_corpus), staged in recipe order:

1. **mix** — per-stratum epoch weights ('2 epochs of wiki, 0.3 of
   CC'); adds ``epoch`` and re-mints the packing id as
   ``doc_id * ceil(max_weight) + epoch`` so repeated epochs pack as
   distinct, deterministically ordered rows.
2. **bpe** — either learn a merge table here (``--bpe-train N``,
   optionally persisted) or load one; the text column becomes the
   space-joined subword stream, so downstream token counts are REAL
   model-token counts instead of whitespace words.
3. **shape** — ``--pack SEQLEN`` (GPT concat-and-split; every output
   row is exactly SEQLEN tokens except each group's final partial
   bin; ``--spans-out`` also writes the (doc, bin) lineage table) or
   ``--chunk MAX[:OVERLAP]`` (sliding windows, RAG/context prep).

Prints a one-line JSON report (docs in, rows out, token totals).
Scales like its stages: mixing and chunking are map-only, BPE
training touches the vocab-sized word table, packing shuffles token
slices once keyed by bin.
"""

from __future__ import annotations

import argparse
import json
import math


def _parse_weights(spec: str) -> tuple[dict[str, float], float]:
    weights: dict[str, float] = {}
    default = 0.0
    for part in spec.split(","):
        key, _, val = part.partition("=")
        if key == "*":
            default = float(val)
        else:
            weights[key] = float(val)
    return weights, default


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True,
                    help="packed/chunked rows parquet path")
    shape = ap.add_mutually_exclusive_group(required=True)
    shape.add_argument("--pack", type=int, metavar="SEQLEN",
                       help="concat-and-split packing to SEQLEN tokens")
    shape.add_argument("--chunk", metavar="MAX[:OVERLAP]",
                       help="sliding token windows instead of packing")
    ap.add_argument("--pack-by", default=None,
                    help="group column: each group packs independently")
    ap.add_argument("--manifest-out", default=None, metavar="PARQUET",
                    help="with --pack: write the per-bin attention-"
                         "boundary manifest (doc_ids/doc_starts per "
                         "bin - the document-masking sidecar)")
    ap.add_argument("--spans-out", default=None,
                    help="with --pack: also write the (doc, bin) "
                         "token-range lineage table")
    ap.add_argument("--mix", default=None, metavar="W",
                    help="epoch weights 'en=1.5,*=1.0' (with --mix-by) "
                         "or a single float for the whole corpus")
    ap.add_argument("--mix-by", default=None,
                    help="stratum column for per-stratum --mix weights")
    ap.add_argument("--mix-salt", default="mix")
    ap.add_argument("--bpe-train", type=int, default=None, metavar="N",
                    help="learn N BPE merges on the (mixed) corpus and "
                         "segment with them")
    ap.add_argument("--bpe-merges", default=None, metavar="PARQUET",
                    help="segment with an existing merge table instead")
    ap.add_argument("--bpe-merges-out", default=None, metavar="PARQUET",
                    help="with --bpe-train: persist the learned merges")
    ap.add_argument("--id-col", default="doc_id")
    args = ap.parse_args(argv)
    if args.bpe_train is not None and args.bpe_merges:
        ap.error("--bpe-train and --bpe-merges are exclusive")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-train-prep")
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    report: dict = {"docs_in": n_in}
    id_col = args.id_col

    if args.mix:
        from hadoop_search_engine_spark.operators.curate import mix_corpus

        if "=" in args.mix:
            if not args.mix_by:
                ap.error("per-stratum --mix needs --mix-by")
            weights, default = _parse_weights(args.mix)
            docs = mix_corpus(docs, weights, strata_col=args.mix_by,
                              default_weight=default, salt=args.mix_salt,
                              id_col=id_col)
            wmax = max([*weights.values(), default])
        else:
            docs = mix_corpus(docs, float(args.mix), salt=args.mix_salt,
                              id_col=id_col)
            wmax = float(args.mix)
        # re-mint the packing id: repeated epochs become distinct rows
        # in a deterministic (doc, epoch) order
        cap = int(math.floor(wmax)) + 1
        docs = docs.withColumn(
            id_col, F.col(id_col) * cap + F.col("epoch")
        )
        report["rows_after_mix"] = docs.count()

    merges = None
    if args.bpe_train is not None:
        from hadoop_search_engine_spark.operators.bpe import bpe_train

        merges = bpe_train(docs, n_merges=args.bpe_train)
        if args.bpe_merges_out:
            merges.write.mode("overwrite").parquet(args.bpe_merges_out)
            report["bpe_merges_out"] = args.bpe_merges_out
        report["bpe_merges"] = merges.count()
    elif args.bpe_merges:
        merges = spark.read.parquet(args.bpe_merges)
        report["bpe_merges"] = merges.count()
    if merges is not None:
        from hadoop_search_engine_spark.operators.bpe import bpe_encode

        keep = [c for c in docs.columns if c not in ("text",)]
        seg = bpe_encode(docs, merges, id_col=id_col)
        docs = (
            docs.select(*keep)
            .join(
                seg.select(
                    id_col,
                    F.array_join("bpe_tokens", " ").alias("text"),
                ),
                id_col,
            )
        )

    if args.chunk:
        from hadoop_search_engine_spark.operators.training import chunk_docs

        mx, _, ov = args.chunk.partition(":")
        out = chunk_docs(docs, max_tokens=int(mx), overlap=int(ov or 0),
                         id_col=id_col)
        tok_col = "n_tokens"
    else:
        from hadoop_search_engine_spark.operators.training import (
            pack_manifest,
            pack_spans,
            pack_text,
        )

        if args.manifest_out:
            pack_manifest(
                docs, args.pack, group_col=args.pack_by, id_col=id_col
            ).write.mode("overwrite").parquet(args.manifest_out)
            report["manifest_out"] = args.manifest_out
        if args.spans_out:
            pack_spans(
                docs, args.pack, group_col=args.pack_by, id_col=id_col
            ).write.mode("overwrite").parquet(args.spans_out)
            report["spans_out"] = args.spans_out
        out = pack_text(docs, args.pack, group_col=args.pack_by,
                        id_col=id_col)
        tok_col = "n_tokens"
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    agg = written.agg(
        F.count("*").alias("rows"), F.sum(tok_col).alias("tokens")
    ).first()
    report.update(
        rows_out=int(agg["rows"]), tokens_out=int(agg["tokens"] or 0),
        output=args.output,
    )
    print(json.dumps(report))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
