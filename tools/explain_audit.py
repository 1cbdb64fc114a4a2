"""Physical-plan audit: write PLANS.md with `.explain(formatted)` evidence.

For each headline query this captures the formatted physical plan and
checks the properties that matter at 100 TB:

  * parquet scans carry PushedFilters / a pruned ReadSchema
    (predicate pushdown + column pruning reached the scan);
  * small dimension joins are BroadcastHashJoin, not SortMerge;
  * hot expressions sit inside WholeStageCodegen spans;
  * global sorts only appear as TakeOrderedAndProject (top-k),
    never a full Sort of the corpus.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# In explain("formatted") whole-stage-codegen membership is marked by
# a `* ` operator prefix (the literal "WholeStageCodegen" only appears
# in simple mode), and Generate prints without its generator name in
# the tree.
CHECKS = {
    "scan_project_filter": ["PushedFilters: [", "* Filter"],
    "tpch_q1": ["PushedFilters: [", "HashAggregate"],
    "broadcast_join_agg": ["BroadcastHashJoin"],
    "semi_join_orderby": ["LeftSemi", "TakeOrderedAndProject"],
    "orderby_limit": ["TakeOrderedAndProject"],
    "bm25_topk": ["TakeOrderedAndProject", "HashAggregate"],
    "term_frequencies": ["HashAggregate", "Generate"],
    "inverted_index": ["HashAggregate"],
    "exact_dedup": ["HashAggregate"],
    "ann_cosine_topk": ["TakeOrderedAndProject"],
    # blob chunking must stay pure expressions (codegen'd Project +
    # Generate) — no Exchange, no Python
    "blob_range": ["* Project"],
    # the df-capped shingle join is an equi-join tree (shuffle hash /
    # sort-merge on the shingle key), never a cartesian product
    "ngram_jaccard_capped": ["Join", "HashAggregate", "!CartesianProduct"],
    # banded LSH candidates come from (band, band_hash) / (chunk_id,
    # chunk) EQUI-joins — a cartesian product here is the scale-killer
    # the banding exists to avoid
    "minhash_lsh": ["Join", "!CartesianProduct"],
    "simhash": ["Join", "!CartesianProduct"],
    # fingerprint hashing is JVM expressions over the token array —
    # one projection (HOF aggregate is CodegenFallback, so no `*`),
    # no Exchange, and no Python evaluation anywhere in the plan
    "fingerprint": ["Project", "!Exchange", "!EvalPython"],
    # batch serving: the union of all queries' terms reaches the
    # postings scan as pushed filters (ONE pruned scan for the whole
    # query set), scoring is one grouped-map wave, and the global
    # merge is a per-query Window — never a cartesian join of
    # queries × postings
    "bm25_topk_batch": [
        "PushedFilters: [", "FlatMapGroupsInPandas", "Window",
        "!CartesianProduct",
    ],
    # hybrid RRF: fusion is a bounded union + hash aggregate over
    # k_lex + k_vec rows ending in a top-k — never a corpus-wide sort
    # or a cartesian join of the branches
    "hybrid_search": [
        "HashAggregate", "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # per-doc tf*idf export: the vocab-sized df table is broadcast
    # back onto tf (corpus never re-shuffled for the join) and the
    # rank window partitions by doc_id — no global Sort, no cartesian
    "tfidf_top_terms": [
        "BroadcastHashJoin", "Window", "!CartesianProduct",
    ],
    # relevance metrics: keyed equi-joins of run x qrels plus per-query
    # windows over qrels — no cartesian, no corpus-wide sort
    "ranking_metrics": [
        "Window", "HashAggregate", "!CartesianProduct",
    ],
    # total hits: a count aggregate over the pruned postings decode —
    # map-side partial, one long over the final exchange, no sort
    "search_count": ["HashAggregate", "!CartesianProduct", "!Sort"],
    # significant terms: corpus pruned by a doc_id semi-join to the
    # matched set, vocab-sized lexicon equi-join, 1-row n_fg broadcast,
    # top-k — never a corpus-wide sort or cartesian candidate join
    "significant_terms": [
        "LeftSemi", "TakeOrderedAndProject", "HashAggregate",
        "!CartesianProduct",
    ],
    # percolation: the compiled query-term table joins in as a
    # BROADCAST hash join (map-side; it is KBs), the (doc, query)
    # count is partial-aggregated — no corpus-side shuffle beyond
    # matched pairs, no sort, no cartesian queries x docs
    "percolate": [
        "BroadcastHashJoin", "HashAggregate", "!CartesianProduct",
        "!Sort",
    ],
    # decontamination: the (small) eval shingle set joins the train
    # side as a BROADCAST hash join running beside the tokenize — the
    # train corpus is never shuffled on shingles; per-doc overlap is a
    # partial-aggregated groupBy on doc_id
    "contamination": [
        "BroadcastHashJoin", "HashAggregate", "!CartesianProduct",
    ],
    # corpus-wide line df is a map-side-combinable HashAggregate on
    # the line hash + a join-back — deliberately NOT a window (a
    # window would ship every copy of a hot boilerplate line to one
    # reducer), and no Python anywhere
    "line_dedup_drop_all": [
        "HashAggregate", "!Window", "!EvalPython", "!CartesianProduct",
    ],
    "line_dedup_keep_first": ["HashAggregate", "!Window", "!EvalPython"],
    # PII redaction is a pure projection: fuses with the scan, no
    # shuffle, no Python
    "pii_redact": ["* Project", "!Exchange", "!EvalPython"],
    # within-doc repetition: one projection over the token array —
    # map-only, no shuffle (the agg in the entry is the consumer's)
    "repetition_stats": ["Project", "!Exchange", "!EvalPython"],
    # deterministic sampling: a codegen'd filter beside the scan
    "stratified_sample": ["* Filter", "!Exchange", "!EvalPython"],
    # rescore: both phase-2 joins broadcast (window ids into the
    # embedding scan, surviving vectors back onto the window); final
    # ranking is a top-k, never a global sort
    "rescore_search": [
        "BroadcastHashJoin", "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # terms + top_hits: per-group rank window over the df-bounded hit
    # set — no cartesian, no corpus-wide global sort
    "top_hits_facet": ["Window", "!CartesianProduct"],
    # hit-set percentiles: semi-join prune + one aggregation pass
    "percentiles_facet": ["LeftSemi", "!CartesianProduct"],
    # calendar date_histogram: a partial-aggregated groupBy on the
    # truncated key (|buckets| rows out), gap grid from one min/max +
    # sequence explode — no window, no Python, no cartesian
    "date_histogram": [
        "HashAggregate", "!Window", "!EvalPython", "!CartesianProduct",
    ],
    # int8 ANN: one scan, integer-arithmetic scoring in expressions,
    # top-k — no Python, no global sort
    "ann_int8": ["TakeOrderedAndProject", "!EvalPython", "!Exchange"],
    # analysis chain (stopword filter + S-stem CASE): pure JVM
    # expressions fused with the scan-side token explode — no Python,
    # no shuffle introduced by the analyzer itself
    "analyzed_tokens": ["Generate", "!EvalPython", "!Exchange"],
    # pluggable similarity on the indexed path: same grouped-map
    # scorer wave + top-k as BM25 — swapping the model adds no plan
    # nodes, no cartesian, no corpus sort
    "lm_dirichlet_topk": [
        "FlatMapGroupsInPandas", "TakeOrderedAndProject",
        "!CartesianProduct",
    ],
    # full scored match set: the scorer wave WITHOUT a global sort or
    # top-k — downstream combines consume it unordered (the plan's
    # Sort is the grouped-map's required WITHIN-partition key sort; a
    # global sort would exchange with rangepartitioning)
    "match_scores_all": [
        "FlatMapGroupsInPandas", "!rangepartitioning",
        "!TakeOrderedAndProject", "!CartesianProduct",
    ],
    # multi_match: per-field scorer waves union into ONE partial-agg
    # combine sized by the matched set, ending in a top-k — never a
    # cartesian of fields or a corpus-wide sort
    "multi_match_most_fields": [
        "FlatMapGroupsInPandas", "HashAggregate",
        "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # function_score: the factor side reads ONLY (doc_id, n_chars) —
    # the documents scan is column-pruned (`text` must not appear
    # anywhere in the plan) — and the combine ends in a top-k
    "function_score_gauss": [
        "TakeOrderedAndProject", "!text", "!CartesianProduct",
    ],
    # sliding-window chunking: pure expressions + explode, fuses with
    # the scan — no shuffle, no Python
    "chunk_docs": ["Generate", "!Exchange", "!EvalPython"],
    # packing lineage: the bucketed exclusive-cumsum is per-(group,
    # bucket) windows + a BROADCAST offsets join — never a
    # single-partition corpus window, no Python, no cartesian
    "pack_spans": [
        "Window", "BroadcastHashJoin", "!EvalPython", "!CartesianProduct",
    ],
    # packed rows add exactly the one bin-keyed shuffle (the groupBy)
    "pack_text": [
        "Window", "HashAggregate", "!EvalPython", "!CartesianProduct",
    ],
    # PMI collocations: two partial-agg groupBys + vocab-sized joins;
    # the only nested-loop joins are 1-row broadcast totals — no
    # cartesian, no Python
    "collocations": [
        "HashAggregate", "Join", "!CartesianProduct", "!EvalPython",
    ],
    # epoch mixing: the stratum CASE + per-epoch hash + explode all
    # fuse with the scan — map-only
    "mix_corpus": ["Generate", "!Exchange", "!EvalPython"],
    # BPE segmentation is an ARROW-batched pandas UDF (never
    # row-at-a-time PythonUDF) over one projection
    "bpe_encoded": ["ArrowEvalPython", "!BatchEvalPython", "!Exchange"],
    # composite agg: a partial-aggregated groupBy on the composite key
    # ending in a bounded TakeOrdered page — NEVER a full bucket sort
    # (that is the whole point vs a terms agg at high cardinality)
    "composite_page": [
        "HashAggregate", "TakeOrderedAndProject", "!CartesianProduct",
        "!EvalPython",
    ],
    # terms + metric sub-aggs: ONE groupBy pass computes count and
    # every metric — no window, no per-metric re-scan, no Python
    "terms_metrics": [
        "HashAggregate", "!Window", "!EvalPython", "!CartesianProduct",
    ],
    # extended_stats: one aggregation pass (count/min/max/sum/sumsq),
    # derived fields are a 1-row projection
    "extended_stats": ["HashAggregate", "!Window", "!EvalPython"],
    # filters agg: every named predicate counted in one conditional
    # aggregation — no per-filter scan
    "filters_agg": ["HashAggregate", "!Window", "!EvalPython"],
    # dis_max: branch scorer waves union into one partial-agg combine
    # + top-k — no cartesian of branches, no corpus sort
    "dsl_dis_max": [
        "HashAggregate", "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # URL normalization: pure regex/list expressions fused with the
    # scan — map-only, no Python, no shuffle (the param-list lambdas
    # are HOFs = CodegenFallback, so the Project is unstarred, like
    # fingerprint's aggregate fold)
    "url_normalize": ["Project", "!Exchange", "!EvalPython"],
    # canonical-URL dedup: winner selection is a map-side-combinable
    # min-aggregate (NOT a window — a viral URL would ship every copy
    # to one reducer) + an id-keyed semi-join
    "url_dedup": [
        "HashAggregate", "LeftSemi", "!Window", "!EvalPython",
        "!CartesianProduct",
    ],
    # per-domain census: map-only annotation + one groupBy + a 1-row
    # broadcast total
    "domain_stats": [
        "HashAggregate", "BroadcastNestedLoopJoin", "!EvalPython",
    ],
    # domain cap: one rank window partitioned by domain (the
    # skew_buckets variant splits hot domains; plain path audited) —
    # no Python, no cartesian
    "cap_per_domain": ["Window", "!EvalPython", "!CartesianProduct"],
    # duplicate-span stats: gram stats are a map-side-combinable
    # HashAggregate on the 16-byte murmur pair + a hash-keyed
    # join-back — no window over occurrences, no Python, no cartesian
    "span_dedup_stats": [
        "HashAggregate", "!Window", "!EvalPython", "!CartesianProduct",
    ],
    # span removal adds the coverage anti-join + ordered rebuild agg
    "span_dedup_rewrite": [
        "HashAggregate", "LeftAnti", "!EvalPython", "!CartesianProduct",
    ],
    # token-budget cut: per-bucket windows + a broadcast offsets join
    # (the sort-key-prefix two-phase cumsum) — no corpus-wide single
    # partition window... the offsets frame's own tiny window is
    # unpartitioned by construction (<= order_buckets rows)
    "token_budget": [
        "Window", "BroadcastHashJoin", "!EvalPython", "!CartesianProduct",
    ],
    # structured bool + metadata filter: grouped-map scorer wave +
    # the filter semi-join + top-k, no cartesian
    "dsl_bool_structured_filtered": [
        "FlatMapGroupsInPandas", "LeftSemi", "TakeOrderedAndProject",
        "!CartesianProduct",
    ],
    # cross_fields: per-(field, term) scorer waves -> two hash
    # aggregates -> top-k; never a cartesian of fields x terms
    "multi_match_cross": [
        "FlatMapGroupsInPandas", "HashAggregate",
        "TakeOrderedAndProject", "!CartesianProduct",
    ],
    # JSON props extraction stays JVM expressions beside the scan
    "json_props_agg": ["HashAggregate", "!EvalPython"],
    # adjacency matrix: n + n(n-1)/2 counters in ONE conditional
    # aggregation — no per-pair scan, no window, no Python
    "adjacency_matrix": ["HashAggregate", "!Window", "!EvalPython"],
    # multi-fragment highlight: expressions over the k-row broadcast
    # join — no Python, no extra exchange beyond the join
    "snippet_fragments": ["BroadcastHashJoin", "!EvalPython"],
    # session-9 aggs: every facet is a doc_id semi-join + a partial-
    # aggregated groupBy (bucket-sized output) — no window, no
    # cartesian, and bucket ordering is a TakeOrdered, never a global
    # corpus sort
    "rare_terms": ["LeftSemi", "HashAggregate", "!CartesianProduct",
                   "!Window"],
    "multi_terms_agg": ["LeftSemi", "HashAggregate",
                        "TakeOrderedAndProject", "!CartesianProduct"],
    "terms_order_metric": ["LeftSemi", "HashAggregate",
                           "TakeOrderedAndProject", "!CartesianProduct"],
    "weighted_avg_metric": ["LeftSemi", "HashAggregate",
                            "!CartesianProduct", "!Window"],
    # date_range over events: ONE conditional-aggregation pass for
    # every window — no per-range scans, no Python
    "date_range_agg": ["HashAggregate", "!EvalPython", "!Window"],
    # top_metrics: k rows off a TakeOrdered — never a global sort
    "top_metrics": ["LeftSemi", "TakeOrderedAndProject",
                    "!CartesianProduct"],
    # pipeline aggs: ONE groupBy reduces the corpus to buckets; the
    # window passes run over the bucket-sized frame only (the Sort
    # they need is |buckets| rows) — no Python, no cartesian
    "pipeline_aggs": ["HashAggregate", "Window", "!EvalPython",
                      "!CartesianProduct"],
    "max_bucket": ["HashAggregate", "BroadcastHashJoin",
                   "!CartesianProduct", "!EvalPython"],
    # rollup range query: the p_date filter reaches the file listing
    # (PartitionFilters) and the merge is one partial-aggregated
    # groupBy over bucket-sized rows — raw events never touched
    "rollup_range": ["PartitionFilters", "HashAggregate",
                     "!EvalPython", "!CartesianProduct"],
    # pinned: k-row pin frame broadcasts; final ranking is a top-k
    "pinned_search": ["TakeOrderedAndProject", "!CartesianProduct"],
    # semdedup (production LSH path): sign-bucket EQUI-join candidates
    # + an id-only anti-join — never all-pairs; the hyperplane
    # projection is the Arrow matmul (vectorized), never row-at-a-time
    "semdedup": ["Join", "!CartesianProduct", "ArrowEvalPython",
                 "!BatchEvalPython"],
    # WARC ingest: one binaryFile scan fanned through MapInPandas
    # (file-granular tasks; the only Exchange is the oracle entry's
    # ORDER BY url for the deterministic compare, not the read)
    "warc_ingest": ["MapInPandas", "!CartesianProduct"],
    # ASCII fold is JVM translate/replace inside the tokenize
    # projection — no Python evaluation in the plan at all
    "fold_tokens": ["Generate", "!EvalPython"],
    # corpus top-ngrams: map-side partial agg then top-k, never a
    # global sort of the gram space
    "top_ngrams": ["HashAggregate", "TakeOrderedAndProject",
                   "!EvalPython"],
    # zipf fit: vocabulary-sized window + regr_* fold, corpus touched
    # once by the count aggregate; no Python
    "zipf_fit": ["HashAggregate", "Window", "!EvalPython"],
    # PQ ADC: Arrow-batched table lookups + one top-k; codes scan only
    "ann_pq": ["ArrowEvalPython", "TakeOrderedAndProject",
               "!CartesianProduct"],
    # IVF-PQ: probe prune is a codegen'd filter before the ADC pass
    "ann_ivfpq": ["ArrowEvalPython", "TakeOrderedAndProject",
                  "!CartesianProduct"],
    # ingest pipeline compiles to pure projections over the scan (the
    # only Exchange is the oracle entry's ORDER BY doc_id compare sort)
    "ingest_pipeline": ["Project", "!EvalPython"],
    # link extraction: regex Generate + distinct agg, no Python
    "extract_links": ["Generate", "HashAggregate", "!EvalPython"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", master="local[4]",
                      shuffle_partitions=4)
    qs = entry.queries()
    sections: list[str] = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/explain_audit.py {sf_dir}`. Each section is",
        "the `.explain(\"formatted\")` output plus automated checks for the",
        "plan properties that keep the operator viable at 100 TB (pushdown,",
        "pruning, broadcast, codegen, top-k instead of global sort).",
        "",
    ]
    failures: list[str] = []
    for name, probes in CHECKS.items():
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + a trimmed details section
        tree_end = plan.find("\n\n")
        tree = plan[:tree_end] if tree_end > 0 else plan
        details = plan[tree_end:]
        kept = []
        for para in details.split("\n\n"):
            if any(key in para for key in ("PushedFilters", "ReadSchema", "Arguments: ")):
                kept.append("\n".join(para.splitlines()[:6]))
        results = []
        for probe in probes:
            if probe.startswith("!"):
                needle = probe[1:]
                ok = needle not in plan
                results.append(
                    f"  - {'PASS' if ok else 'FAIL'}: plan does NOT "
                    f"contain `{needle}`"
                )
                if not ok:
                    failures.append(f"{name}: forbidden `{needle}` present")
            else:
                ok = probe in plan
                results.append(
                    f"  - {'PASS' if ok else 'FAIL'}: plan contains `{probe}`"
                )
                if not ok:
                    failures.append(f"{name}: missing `{probe}`")
        sections += [
            f"## {name}",
            "",
            "Checks:",
            *results,
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as f:
        f.write("\n".join(sections) + "\n")
    print(f"wrote {out_path}")
    if failures:
        print("FAILED checks:")
        for fline in failures:
            print(" -", fline)
        sys.exit(1)
    print(f"all plan checks passed ({len(CHECKS)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
