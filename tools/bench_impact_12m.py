"""Champion-list (impact-ordered pruning) datapoint on the 12M-doc
index built by tools/bench_scale_12m.py.

Round 4's query-algorithm audit measured the honest ceiling of both
existing scorers on disjunctive head-term queries at 12M docs (dense
p50 ~0.85-1.05 s; WAND ~10x worse) and recorded impact ordering /
static pruning as the 100x lever. This harness measures that lever:
build the sidecar once (a postings-table pass, corpus untouched),
then run the 50-query reference fixture set through
``impact_topk_rows`` and the dense driver scorer side by side —
asserting rank+score identity per query and reporting p50/p95 for
both, the prune rate, and the candidate/probe counters.

Usage: python tools/bench_impact_12m.py [m] [index_dir]
(defaults: m=1024, /tmp/hse_scale12m_index)

``SPARK_GRAFT_NORMS_FREE=1`` adds a second phase: pin
DL_BROADCAST_MAX_DOCS to 1000 (so the 12M index has NO driver
doc-norms array — the 10^12-doc serving-node regime), reload the
index, and serve the same fixture set through the self-contained
sidecar (champion dls from its rows, shard-filtered doc_stats /
postings probes). Served queries must match the norms-backed answers
exactly; uncertified ones must REFUSE (ImpactRefused), never guess.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
INDEX = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hse_scale12m_index"


def main() -> None:
    from hadoop_search_engine_spark.corpus import (
        SYNONYMS,
        reference_queries,
    )
    from hadoop_search_engine_spark.operators.impact import (
        ImpactLists,
        build_impact_lists,
        impact_topk_rows,
    )
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk_rows,
    )
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(app_name="hse-impact12m", master="local[16]",
                      shuffle_partitions=64)
    idx = Index.load(spark, INDEX)
    n_docs = idx.stats.n_docs

    if ImpactLists.load(idx) is None or (
        ImpactLists.load(idx).meta.get("m") != M
    ):
        t0 = time.time()
        s = build_impact_lists(idx, m=M)
        build_sec = time.time() - t0
        print(f"sidecar built: {s} in {build_sec:.1f}s", flush=True)
    else:
        build_sec = 0.0
        print("sidecar reused", flush=True)

    qs = reference_queries()
    # warm BOTH paths over the FULL set (postings LRU, decoded-tf LRU,
    # lexicon map, dl array, sidecar rows) — the measured pass is then
    # the hot serving-node comparison, so the numbers isolate the
    # algorithmic cost instead of whichever path paid the cold read
    for rq in qs:
        impact_topk_rows(idx, rq["query_text"], k=rq["k"],
                         synonyms=SYNONYMS)
        search_topk_rows(idx, rq["query_text"], k=rq["k"],
                         synonyms=SYNONYMS, algorithm="dense")

    imp_lat, den_lat = [], []
    n_pruned = n_full = n_fb = 0
    tot_cand = tot_probe = 0
    mism = []
    for rq in qs:
        info: dict = {}
        t0 = time.perf_counter()
        a = impact_topk_rows(idx, rq["query_text"], k=rq["k"],
                             synonyms=SYNONYMS, info=info)
        imp_lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        b = search_topk_rows(idx, rq["query_text"], k=rq["k"],
                             synonyms=SYNONYMS, algorithm="dense")
        den_lat.append(time.perf_counter() - t0)
        if a != b:
            mism.append(rq["qid"])
        if info.get("mode") == "pruned":
            n_pruned += 1
            tot_cand += info.get("candidates", 0)
            tot_probe += info.get("probes", 0)
        elif info.get("mode") == "full":
            n_full += 1
        else:
            n_fb += 1

    def pct(v, p):
        s = sorted(v)
        return s[int(p * (len(s) - 1))]

    out = {
        "n_docs": n_docs,
        "m": M,
        "sidecar_build_sec": round(build_sec, 1),
        "queries": len(qs),
        "identical": len(mism) == 0,
        "mismatched_qids": mism,
        "pruned": n_pruned,
        "full": n_full,
        "fallback": n_fb,
        "avg_candidates": round(tot_cand / max(1, n_pruned), 1),
        "avg_probes": round(tot_probe / max(1, n_pruned), 1),
        "impact_p50_sec": round(pct(imp_lat, 0.5), 4),
        "impact_p95_sec": round(pct(imp_lat, 0.95), 4),
        "dense_p50_sec": round(pct(den_lat, 0.5), 4),
        "dense_p95_sec": round(pct(den_lat, 0.95), 4),
        "impact_total_sec": round(sum(imp_lat), 2),
        "dense_total_sec": round(sum(den_lat), 2),
    }
    print("IMPACTRESULT " + json.dumps(out), flush=True)

    if os.environ.get("SPARK_GRAFT_NORMS_FREE") == "1":
        from hadoop_search_engine_spark.operators import query_exec as qx
        from hadoop_search_engine_spark.operators.impact import (
            ImpactRefused,
        )

        expected = {
            rq["qid"]: impact_topk_rows(
                idx, rq["query_text"], k=rq["k"], synonyms=SYNONYMS
            )
            for rq in qs
        }
        qx.DL_BROADCAST_MAX_DOCS = 1000
        nf = Index.load(spark, INDEX)
        assert nf.dl_array() is None
        served = refused = wrong = 0
        nf_lat = []
        for rq in qs:  # warm
            try:
                impact_topk_rows(nf, rq["query_text"], k=rq["k"],
                                 synonyms=SYNONYMS)
            except ImpactRefused:
                pass
        for rq in qs:
            t0 = time.perf_counter()
            try:
                got = impact_topk_rows(nf, rq["query_text"],
                                       k=rq["k"], synonyms=SYNONYMS)
            except ImpactRefused:
                refused += 1
                continue
            nf_lat.append(time.perf_counter() - t0)
            served += 1
            if got != expected[rq["qid"]]:
                wrong += 1
        nf_lat.sort()
        print("NORMSFREE " + json.dumps({
            "served": served,
            "refused": refused,
            "wrong": wrong,
            "p50_sec": round(nf_lat[len(nf_lat) // 2], 4) if nf_lat else None,
            "p95_sec": (
                round(nf_lat[int(0.95 * (len(nf_lat) - 1))], 4)
                if nf_lat else None
            ),
        }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
