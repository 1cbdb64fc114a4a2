"""spark-submit entrypoint: BM25 top-k query over a built index.

    spark-submit --py-files dist/hadoop_search_engine_spark.zip \
        jobs/search.py --index /path/to/index --query "person car" \
        [--k 10] [--algorithm wand|dense] [--documents /path/docs.parquet]
        [--compat-or-union]

With ``--documents`` the top-k ids are materialized back to full rows
(url/text), the analog of the reference's per-result JSON fetch
(/root/reference/server/src/services/search.service.js:66-83) done as
one broadcast join instead of k sequential round trips.
``--compat-or-union`` runs the reference's exact unscored OR-union
first-seen semantics instead of BM25. ``--queries-file queries.json``
(a ``{query_id: query_text}`` object) serves the whole set in ONE
batch pass instead of per-query jobs.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_after(s: str | None) -> tuple[int, float] | None:
    if not s:
        return None
    doc, score = s.split(":", 1)
    return (int(doc), float(score))


def _parse_after_seg(s: str | None) -> tuple[int, int, float] | None:
    if not s:
        return None
    seg, doc, score = s.split(":", 2)
    return (int(seg), int(doc), float(score))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index",
                    help="index dir (required unless --segments)")
    ap.add_argument("--segments",
                    help="comma-separated index dirs: federated serving "
                         "with global BM25 stats (base + delta segments), "
                         "instead of --index")
    ap.add_argument("--query",
                    help="query text (required unless --queries-file)")
    ap.add_argument("--queries-file",
                    help="JSON file {query_id: query_text, ...}: serve the "
                         "whole set in one batch pass (search_topk_batch)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=None,
                    help="override BM25 k1 for this query (no rebuild)")
    ap.add_argument("--b", type=float, default=None,
                    help="override BM25 b for this query (no rebuild)")
    ap.add_argument("--similarity",
                    choices=["bm25", "lm_dirichlet", "tfidf", "boolean"],
                    default="bm25",
                    help="ranking model for this query over the same "
                         "index (operators/ranking.py); lm_dirichlet "
                         "uses mu=2000")
    ap.add_argument("--algorithm",
                    choices=["auto", "wand", "dense", "impact"],
                    default="auto",
                    help="impact = champion-list pruned serving "
                         "(operators/impact.py; needs a sidecar from "
                         "maintain.py --build-impact, disjunctive "
                         "queries only; exact — uncertified queries "
                         "fall back to dense)")
    ap.add_argument("--mode", choices=["or", "and"], default="or",
                    help="or = reference-style disjunctive; and = conjunctive")
    ap.add_argument("--documents", help="documents parquet for materialization")
    ap.add_argument("--output", default=None,
                    help="write the result DataFrame as parquet here "
                         "(offline export) instead of printing")
    ap.add_argument("--compat-or-union", action="store_true")
    ap.add_argument("--phrase", action="store_true",
                    help="exact-phrase match (needs an index built with positions)")
    ap.add_argument("--phrase-prefix", action="store_true",
                    help="search-as-you-type (ES match_phrase_prefix): "
                         "all tokens but the last match as a phrase, the "
                         "last is a prefix expanded to --max-expansions "
                         "lexicon terms (needs positions)")
    ap.add_argument("--near", type=int, default=None, metavar="W",
                    help="unordered proximity: all query terms within "
                         "any W-token window (needs a positional index)")
    ap.add_argument("--slop", type=int, default=0,
                    help="with --phrase: allow up to SLOP intervening "
                         "tokens per gap (ordered proximity; 0 = exact)")
    ap.add_argument("--boolean", action="store_true",
                    help="ranked-boolean query: nested AND/OR/NOT with "
                         "parens, e.g. 'spark AND (query OR merge) NOT "
                         "vector' (BM25 over the positive terms)")
    ap.add_argument("--suggest", action="store_true",
                    help="treat --query as an autocomplete prefix")
    ap.add_argument("--wildcard", action="store_true",
                    help="treat --query as a wildcard pattern (* = any "
                         "run, ? = one char; trailing-star prefix patterns "
                         "take the cheaper StartsWith lexicon probe): "
                         "expand against the lexicon capped at "
                         "--max-expansions by df, then BM25 over the "
                         "expansions")
    ap.add_argument("--max-expansions", type=int, default=50,
                    help="with --wildcard: expansion cap (df-ranked)")
    ap.add_argument("--after", metavar="DOC_ID:SCORE",
                    help="cursor pagination: the last result pair of the "
                         "previous page (exact score) — returns the next "
                         "--k hits; with --segments use "
                         "SEGMENT:DOC_ID:SCORE")
    ap.add_argument("--fuzzy", action="store_true",
                    help="spell-correct out-of-vocabulary query terms")
    ap.add_argument("--rows", action="store_true",
                    help="serving fast path: print (doc_id, score) pairs "
                         "as one JSON line via search_topk_rows — no Spark "
                         "DataFrame (the DataFrame wrap alone costs 10-180 "
                         "ms of py4j round trips per query)")
    ap.add_argument("--msm", type=int, default=None, metavar="M",
                    help="minimum_should_match: docs must contain at least "
                         "M distinct query terms (mode=or only)")
    ap.add_argument("--count", action="store_true",
                    help="print the total-hits count as one JSON line "
                         "instead of results (count_matches)")
    ap.add_argument("--significant", action="store_true",
                    help="print the significant terms of the result set "
                         "(requires --documents for the foreground "
                         "re-read; JLH scorer, top --k terms)")
    ap.add_argument("--embeddings", metavar="PARQUET",
                    help="vector table for --dsl knn clauses "
                         "(vec_id, embedding)")
    ap.add_argument("--dsl", metavar="JSON",
                    help="ES-style request body (operators/dsl.py): "
                         '\'{"query": {"match": {"text": "spark"}}, '
                         '"size": 10}\'; hits (and any aggs) print as '
                         "JSON. --documents supplies the metadata "
                         "table for filters/function_score/aggs")
    ap.add_argument("--params", metavar="JSON",
                    help="search-template parameters: treat --dsl as "
                         "an ES _search/template source and substitute "
                         '{{var}} placeholders, e.g. \'{"q": "spark"}\'')
    ap.add_argument("--msearch-file", metavar="FILE",
                    help="ES _msearch: one JSON request body per line; "
                         "prints one JSON result line per body "
                         "(--params applies to each)")
    ap.add_argument("--alias", metavar="REGISTRY_DIR:NAME",
                    help="resolve the index through an alias registry "
                         "(operators/aliases.py) instead of --index/"
                         "--segments; a multi-dir alias serves federated")
    args = ap.parse_args(argv)
    if args.alias:
        if args.index or args.segments:
            ap.error("--alias replaces --index/--segments")
        reg, _, name = args.alias.rpartition(":")
        if not reg or not name:
            ap.error("--alias needs REGISTRY_DIR:NAME")
        from hadoop_search_engine_spark.operators.aliases import resolve_alias

        dirs = resolve_alias(reg, name)
        if len(dirs) == 1:
            args.index = dirs[0]
        else:
            args.segments = ",".join(dirs)

    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        materialize,
        or_union_search,
        search_topk,
    )
    from hadoop_search_engine_spark.session import get_spark

    if args.dsl or args.msearch_file:
        if not args.index:
            ap.error("--dsl/--msearch-file require --index")
        if args.dsl and args.msearch_file:
            ap.error("--dsl and --msearch-file are exclusive")
        spark = get_spark(app_name="hse-search")
        from hadoop_search_engine_spark.operators.dsl import (
            render_search_template,
            search_dsl,
        )

        docs = (spark.read.parquet(args.documents)
                if args.documents else None)
        emb = (spark.read.parquet(args.embeddings)
               if args.embeddings else None)
        ix = Index.load(spark, args.index)
        params = json.loads(args.params) if args.params else None
        if args.msearch_file:
            with open(args.msearch_file) as fh:
                bodies = [json.loads(line) for line in fh
                          if line.strip()]
        else:
            bodies = [json.loads(args.dsl)]
        for body in bodies:
            if params is not None:
                body = render_search_template(body, params)
            res = search_dsl(ix, body, documents=docs, embeddings=emb)
            out = {"hits": [r.asDict() for r in res.hits.collect()]}
            for name, df in res.aggs.items():
                out.setdefault("aggregations", {})[name] = [
                    r.asDict() for r in df.collect()
                ]
            for name, df in res.inner_hits.items():
                out.setdefault("inner_hits", {})[name] = [
                    r.asDict() for r in df.collect()
                ]
            print(json.dumps(out, default=str))
        if SparkSession.getActiveSession() is not None:
            spark.stop()
        return

    if bool(args.query) == bool(args.queries_file):
        ap.error("exactly one of --query / --queries-file is required")
    if args.after and (args.boolean or args.suggest or args.compat_or_union
                       or args.queries_file):
        ap.error("--after is not supported with --boolean/--suggest/"
                 "--compat-or-union/--queries-file")
    if bool(args.index) == bool(args.segments):
        ap.error("exactly one of --index / --segments is required")
    specialized = (args.boolean or args.suggest or args.compat_or_union
                   or args.phrase or args.phrase_prefix or args.wildcard
                   or args.fuzzy or args.queries_file or args.segments)
    if args.msm is not None and (specialized or args.rows or
                                 args.mode != "or"):
        ap.error("--msm applies to the plain single-query DataFrame path "
                 "with --mode or")
    if (args.count or args.significant) and (specialized or args.rows):
        ap.error("--count/--significant apply to the plain single-query "
                 "path")
    if args.significant and not args.documents:
        ap.error("--significant requires --documents (foreground docs are "
                 "re-read from the corpus)")

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="hse-search")
    if args.segments:
        from hadoop_search_engine_spark.operators.query_exec import (
            search_topk_segments,
            search_topk_segments_batch,
        )

        segs = [Index.load(spark, d) for d in args.segments.split(",")]
        if args.queries_file:

            with open(args.queries_file) as fh:
                qs = json.load(fh)
            result = search_topk_segments_batch(segs, qs, k=args.k,
                                                mode=args.mode)
            result.show(args.k * len(qs), truncate=80)
        elif args.rows:

            from hadoop_search_engine_spark.operators.query_exec import (
                search_topk_segments_rows,
            )

            triples = search_topk_segments_rows(
                segs, args.query, k=args.k, mode=args.mode,
                after=_parse_after_seg(args.after))
            print(json.dumps([
                {"segment": i, "doc_id": d, "score": s}
                for i, d, s in triples
            ]))
        else:
            result = search_topk_segments(
                segs, args.query, k=args.k, mode=args.mode,
                after=_parse_after_seg(args.after))
            result.show(args.k, truncate=80)
        if owns_session:
            spark.stop()
        return
    idx = Index.load(spark, args.index)
    if args.queries_file:

        from hadoop_search_engine_spark.operators.query_exec import (
            search_topk_batch,
        )

        with open(args.queries_file) as fh:
            qs = json.load(fh)
        if args.rows:
            from hadoop_search_engine_spark.operators.query_exec import (
                search_topk_batch_rows,
            )

            per_q = search_topk_batch_rows(idx, qs, k=args.k,
                                           mode=args.mode,
                                           k1=args.k1, b=args.b)
            print(json.dumps({
                qid: [{"doc_id": d, "score": s} for d, s in pairs]
                for qid, pairs in per_q.items()
            }))
            if owns_session:
                spark.stop()
            return
        result = search_topk_batch(idx, qs, k=args.k, mode=args.mode,
                                   k1=args.k1, b=args.b)
        result.show(args.k * len(qs), truncate=80)
        if owns_session:
            spark.stop()
        return
    if args.suggest:
        from hadoop_search_engine_spark.operators.query_exec import suggest_terms

        result = suggest_terms(idx, args.query, k=args.k)
    elif args.wildcard:
        from hadoop_search_engine_spark.operators.query_exec import (
            prefix_search,
            wildcard_search,
        )

        pat = args.query.strip()
        # only a TRAILING-star pattern is a prefix query; a pattern
        # with no wildcard at all stays on wildcard_search (exact-term
        # match), matching the library semantics
        is_prefix = (
            pat.endswith("*")
            and "*" not in pat[:-1]
            and "?" not in pat[:-1]
        )
        fn = prefix_search if is_prefix else wildcard_search
        result = fn(idx, pat, k=args.k, max_expansions=args.max_expansions,
                    k1=args.k1, b=args.b, after=_parse_after(args.after))
        if args.documents:
            docs = spark.read.parquet(args.documents)
            result = materialize(result, docs)
    elif args.compat_or_union:
        result = or_union_search(idx, args.query, limit=args.k)
    elif args.fuzzy:
        from hadoop_search_engine_spark.operators.query_exec import (
            fuzzy_search_topk,
        )

        result = fuzzy_search_topk(idx, args.query, k=args.k, mode=args.mode,
                                   after=_parse_after(args.after))
        if args.documents:
            docs = spark.read.parquet(args.documents)
            result = materialize(result, docs)
    elif args.phrase:
        from hadoop_search_engine_spark.operators.query_exec import phrase_search

        result = phrase_search(idx, args.query, k=args.k, slop=args.slop,
                               first_end=args.first_end,
                               after=_parse_after(args.after))
    elif args.phrase_prefix:
        from hadoop_search_engine_spark.operators.query_exec import (
            phrase_prefix_search,
        )

        result = phrase_prefix_search(
            idx, args.query, k=args.k, slop=args.slop,
            max_expansions=args.max_expansions,
            after=_parse_after(args.after),
        )
    elif args.near is not None:
        from hadoop_search_engine_spark.operators.query_exec import near_search

        result = near_search(idx, args.query, window=args.near, k=args.k,
                             after=_parse_after(args.after))
    elif args.boolean:
        from hadoop_search_engine_spark.operators.boolean import (
            search_topk_boolean,
        )

        result = search_topk_boolean(idx, args.query, k=args.k,
                                     k1=args.k1, b=args.b)
        if args.documents:
            docs = spark.read.parquet(args.documents)
            result = materialize(result, docs)
    elif args.count:

        from hadoop_search_engine_spark.operators.analytics import (
            count_matches,
        )

        n = count_matches(idx, args.query, mode=args.mode).collect()[0][
            "n_hits"
        ]
        print(json.dumps({"query": args.query, "mode": args.mode,
                          "n_hits": int(n)}))
        if owns_session:
            spark.stop()
        return
    elif args.significant:
        from hadoop_search_engine_spark.operators.analytics import (
            significant_terms,
        )

        docs = spark.read.parquet(args.documents)
        result = significant_terms(idx, docs, args.query, k=args.k,
                                   mode=args.mode)
    elif args.algorithm == "impact":
        if (args.mode != "or" or args.after
                or args.similarity != "bm25" or args.msm is not None):
            ap.error("--algorithm impact serves plain disjunctive "
                     "queries (no --mode and/--after/--similarity/"
                     "--msm); those compose through the dense scorer")
        from hadoop_search_engine_spark.operators.impact import (
            impact_topk,
            impact_topk_rows,
        )

        if args.rows and not args.documents:
            info: dict = {}
            pairs = impact_topk_rows(idx, args.query, k=args.k,
                                     k1=args.k1, b=args.b, info=info)
            print(json.dumps([{"doc_id": d, "score": s}
                              for d, s in pairs]))
            if owns_session:
                spark.stop()
            return
        result = impact_topk(idx, args.query, k=args.k, k1=args.k1,
                             b=args.b)
        if args.documents:
            docs = spark.read.parquet(args.documents)
            result = materialize(result, docs)
    else:
        if args.rows and not args.documents:

            from hadoop_search_engine_spark.operators.query_exec import (
                search_topk_rows,
            )

            pairs = search_topk_rows(idx, args.query, k=args.k,
                                     algorithm=args.algorithm,
                                     mode=args.mode, k1=args.k1, b=args.b,
                                     after=_parse_after(args.after),
                                     similarity=args.similarity)
            print(json.dumps([{"doc_id": d, "score": s} for d, s in pairs]))
            if owns_session:
                spark.stop()
            return
        result = search_topk(idx, args.query, k=args.k, algorithm=args.algorithm,
                             mode=args.mode, k1=args.k1, b=args.b,
                             after=_parse_after(args.after),
                             min_should_match=args.msm,
                             similarity=args.similarity)
        if args.documents:
            docs = spark.read.parquet(args.documents)
            result = materialize(result, docs)
    if args.output:
        result.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output,
                          "rows": spark.read.parquet(args.output).count()}))
    else:
        result.show(args.k, truncate=80)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
