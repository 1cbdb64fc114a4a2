"""Ingestion/materialization edge coverage: binaryFile source, catalog
(parquet branch + Iceberg gating), and top-k doc materialization.

Reference analogs: upload_videos_to_hive.py:16-36 (file ingest),
process.py:204-219 / 248-250 (managed-table create/append),
search.service.js:66-83 (per-doc fetch -> materialize join).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.corpus import extract_text
from hadoop_search_engine_spark.sources.binary_files import (
    assets_to_documents,
    read_binary_assets,
)
from hadoop_search_engine_spark.sources.catalog import Catalog, iceberg_available


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    payloads = {
        "a.html": b"<html><body>Hello   spark <b>world</b></body></html>",
        "b.html": "<p>acentos y señales</p>".encode(),
        "c.html": b"no tags at all, just text",
        "d.txt": b"not html \xff\xfe raw bytes",  # invalid utf-8 tail
    }
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    return str(d), payloads


def test_read_binary_assets_byte_identical(spark, asset_dir):
    path, payloads = asset_dir
    df = read_binary_assets(spark, path)
    rows = {os.path.basename(r["url"]): r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name]["payload"]) == data
        assert rows[name]["length"] == len(data)


def test_read_binary_assets_glob_filter(spark, asset_dir):
    path, _ = asset_dir
    df = read_binary_assets(spark, path, glob="*.html")
    names = {os.path.basename(r["url"]) for r in df.select("url").collect()}
    assert names == {"a.html", "b.html", "c.html"}


def test_assets_to_documents_extracts_canonical_text(spark, asset_dir):
    path, payloads = asset_dir
    docs = assets_to_documents(read_binary_assets(spark, path))
    assert [f.name for f in docs.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    rows = {os.path.basename(r["url"]): r for r in docs.collect()}
    for name, data in payloads.items():
        # the per-row invariant: text == extract_text(html), byte-identical
        assert rows[name]["text"] == extract_text(data)
        assert bytes(rows[name]["html"]) == data


def test_catalog_parquet_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    assert not cat.use_iceberg  # no Iceberg jars in this container
    assert not cat.exists("t1")

    df1 = spark.range(5).select(
        F.col("id"), (F.col("id") % 2).alias("part")
    )
    cat.create_or_replace(df1, "t1", partition_by=["part"])
    assert cat.exists("t1")
    assert cat.read("t1").count() == 5

    # overwrite semantics: create_or_replace drops prior contents
    df2 = spark.range(3).select(F.col("id"), (F.col("id") % 2).alias("part"))
    cat.create_or_replace(df2, "t1", partition_by=["part"])
    assert cat.read("t1").count() == 3

    # append adds rows
    cat.append(df1, "t1", partition_by=["part"])
    assert cat.read("t1").count() == 8

    # the partition column became a directory (layout check)
    assert any(
        p.startswith("part=") for p in os.listdir(str(tmp_path / "cat" / "t1"))
    )


def test_iceberg_gating_is_off_without_catalog_conf(spark):
    assert iceberg_available(spark) is False


def test_materialize_returns_topk_docs_in_score_order(
    spark, tiny_index, tiny_corpus, tiny_oracle
):
    from hadoop_search_engine_spark.operators.query_exec import (
        materialize,
        search_topk,
    )

    topk = search_topk(tiny_index, "w00000 w00123", k=5)
    out = materialize(topk, tiny_corpus).collect()
    want = tiny_oracle.search("w00000 w00123", k=5)
    assert [r["doc_id"] for r in out] == [d for d, _ in want]
    # materialization carries the corpus payload columns
    assert all(r["url"] and r["text"] for r in out)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
