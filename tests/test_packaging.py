"""Packaging + spark-submit job entrypoints.

The north rule ships the job via ``spark-submit --py-files`` — prove
the zip artifact is importable in isolation and the job mains run
end-to-end against a local session (spark-submit in local mode execs
the same python main with the zip on sys.path).
"""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_importable(tmp_path):
    pkg_dir = os.path.join(REPO, "hadoop_search_engine_spark")
    zip_path = tmp_path / "hadoop_search_engine_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    # import from the zip only (cwd stripped) in a clean interpreter
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import hadoop_search_engine_spark as p; "
        "from hadoop_search_engine_spark.functions import codec; "
        "import numpy as np; "
        "assert codec.varint_decode(codec.varint_encode(np.array([0, 1, 300])))"
        ".tolist() == [0, 1, 300]; print('zip-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zip_path)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "zip-ok" in out.stdout


def test_build_and_search_jobs(spark, tmp_path):
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids

    docs_path = str(tmp_path / "docs.parquet")
    idx_dir = str(tmp_path / "index")
    assign_doc_ids(gen_documents(spark, 400, n_partitions=4)).write.parquet(docs_path)

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import build_index as build_job
        import search as search_job

        build_job.main([
            "--input", docs_path, "--output", idx_dir, "--n-buckets", "4",
        ])
        assert os.path.exists(os.path.join(idx_dir, "stats.json"))
        search_job.main(["--index", idx_dir, "--query", "needle7", "--k", "5"])
        search_job.main([
            "--index", idx_dir, "--query", "needle7", "--k", "5",
            "--documents", docs_path, "--compat-or-union",
        ])
    finally:
        sys.path.remove(os.path.join(REPO, "jobs"))


def test_train_prep_job(spark, tmp_path):
    """End-to-end recipe CLI: mix -> bpe -> pack, with spans lineage
    and persisted merges."""
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from pyspark.sql import functions as F

    docs_path = str(tmp_path / "docs.parquet")
    assign_doc_ids(gen_documents(spark, 300, n_partitions=4)).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("es")
    ).write.parquet(docs_path)

    out = str(tmp_path / "packed")
    spans = str(tmp_path / "spans.parquet")
    manifest = str(tmp_path / "manifest.parquet")
    merges = str(tmp_path / "merges.parquet")
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import train_prep

        train_prep.main([
            "--input", docs_path, "--output", out, "--pack", "256",
            "--mix", "en=1.5,*=1.0", "--mix-by", "lang",
            "--bpe-train", "40", "--bpe-merges-out", merges,
            "--spans-out", spans, "--manifest-out", manifest,
        ])
    finally:
        sys.path.remove(os.path.join(REPO, "jobs"))

    packed = spark.read.parquet(out)
    rows = packed.collect()
    assert len(rows) > 0
    # every bin full except the last
    full = [r for r in rows if r["n_tokens"] == 256]
    assert len(rows) - len(full) <= 1
    assert os.path.exists(os.path.join(spans, "_SUCCESS"))
    # the attention-boundary sidecar joins the packed rows on bin_id
    # and carries the same token totals
    man = spark.read.parquet(manifest)
    mt = {r["bin_id"]: r["n_tokens"] for r in man.collect()}
    assert mt == {r["bin_id"]: r["n_tokens"] for r in rows}
    assert all(len(r["doc_ids"]) == len(r["doc_starts"]) >= 1
               for r in man.collect())
    assert spark.read.parquet(merges).count() == 40
    # BPE segmentation happened: packed text contains subword merges
    # (END marker visible in the token stream)
    assert "</w>" in rows[0]["text"]
    # chunk mode too
    out2 = str(tmp_path / "chunks")
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import train_prep

        train_prep.main([
            "--input", docs_path, "--output", out2, "--chunk", "64:8",
        ])
    finally:
        sys.path.remove(os.path.join(REPO, "jobs"))
    ch = spark.read.parquet(out2)
    assert ch.agg({"n_tokens": "max"}).first()[0] <= 64
