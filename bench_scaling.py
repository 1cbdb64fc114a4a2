"""Scaling-efficiency evidence for the north rule.

The rule requires >= 0.8 throughput scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so (per BASELINE.md)
the same index-build job runs at two parallelism levels — local[8] and
local[32] — over the SAME deterministic synthetic corpus, and

    efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4

is reported, along with query-throughput at both levels. Each level
runs in a fresh SparkSession (JVM reused, executor pool resized).
Results are appended to BENCH.md.

Usage: python bench_scaling.py [n_docs] (default 200000)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
QUERIES = ["w00000", "spark query table", "w00010 w00200 w03000", "needle7 w00123"]


def run_level(cores: int, n_docs: int) -> dict:
    # a fresh python subprocess per level would be cleanest; within one
    # process we stop() the session so the next builder re-creates the
    # scheduler with the new master string.
    from pyspark.sql import SparkSession

    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index, search_topk
    from hadoop_search_engine_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active:
        active.stop()
    spark = get_spark(
        app_name=f"hse-scaling-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    out = f"/tmp/hse_scaling_index_{cores}"
    shutil.rmtree(out, ignore_errors=True)

    docs = assign_doc_ids(
        gen_documents(spark, n_docs, n_partitions=cores * 2), num_partitions=cores * 2
    ).select("doc_id", "text")

    t0 = time.time()
    build_index(spark, docs, out, n_buckets=16)
    build_sec = time.time() - t0

    idx = Index.load(spark, out)
    search_topk(idx, "w00001", k=10).collect()  # warm
    q_secs = []
    for q in QUERIES:
        t0 = time.time()
        search_topk(idx, q, k=10).collect()
        q_secs.append(time.time() - t0)

    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "query_sec_each": [round(s, 3) for s in q_secs],
        "queries_per_sec": round(len(q_secs) / sum(q_secs), 2),
    }


def main() -> None:
    low = run_level(8, N_DOCS)
    high = run_level(32, N_DOCS)
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / 4.0
    result = {"local8": low, "local32": high, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    lines = [
        "",
        f"## Scaling run {stamp} — {N_DOCS} synthetic docs (gen_documents, seed-free counter RNG)",
        "",
        "| level | build sec | docs/sec | queries/sec (4-query set) |",
        "|---|---|---|---|",
        f"| local[8] | {low['build_sec']} | {low['docs_per_sec']} | {low['queries_per_sec']} |",
        f"| local[32] | {high['build_sec']} | {high['docs_per_sec']} | {high['queries_per_sec']} |",
        "",
        f"**Scaling efficiency (docs/sec@32 / docs/sec@8) / 4 = {eff:.3f}**"
        f" (north-rule target >= 0.8; cores stand in for executors per BASELINE.md).",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
