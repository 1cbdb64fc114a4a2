"""WARC container source/sink: round-trip byte identity, torn-tail
tolerance, record-type filtering, partition invariance."""

from __future__ import annotations

import datetime as dt
import gzip
import os

import pytest

from hadoop_search_engine_spark.corpus import extract_text, gen_documents
from hadoop_search_engine_spark.sources import warc as W

UTC = dt.timezone.utc


def _rows(n=7):
    return [
        (
            f"https://ex.com/p/{i}",
            dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i),
            f"<html><body><p>doc {i} body</p></body></html>".encode(),
        )
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip(tmp_path):
    rows = _rows()
    for compress in (False, True):
        p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
        assert W.write_warc(p, iter(rows), compress=compress) == len(rows)
        data = open(p, "rb").read()
        recs = list(W.iter_warc_records(data))
        assert len(recs) == len(rows)
        for (url, ts, html), (headers, payload) in zip(rows, recs):
            assert headers["warc-target-uri"] == url
            assert headers["warc-type"] == "response"
            assert W.parse_warc_date(headers["warc-date"]) == ts
            status, hh, body = W.split_http_response(payload)
            assert status == 200
            assert hh["content-type"] == "text/html"
            assert body == html  # byte identity through the container


def test_gzip_is_member_per_record_and_deterministic(tmp_path):
    rows = _rows(3)
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    W.write_warc(p1, iter(rows), compress=True)
    W.write_warc(p2, iter(rows), compress=True)
    d1, d2 = open(p1, "rb").read(), open(p2, "rb").read()
    assert d1 == d2  # pinned mtime -> byte-deterministic
    # 3 independent members: a plain single-stream gunzip of the first
    # member alone must yield exactly one record.
    import zlib

    d = zlib.decompressobj(wbits=47)
    first = d.decompress(d1) + d.flush()
    assert len(list(W.iter_warc_records(first))) == 1
    assert d.unused_data  # more members follow


def test_truncated_tail_is_dropped_not_fatal(tmp_path):
    rows = _rows(5)
    p = str(tmp_path / "a.warc")
    W.write_warc(p, iter(rows), compress=False)
    data = open(p, "rb").read()
    # cut mid-payload of the last record
    cut = data[: len(data) - 30]
    recs = list(W.iter_warc_records(cut))
    assert len(recs) == 4
    # cut mid-header
    hdr_pos = cut.rfind(b"WARC/1.0")
    recs2 = list(W.iter_warc_records(data[: hdr_pos + 20]))
    assert len(recs2) == 4


def test_non_response_records_filtered(tmp_path, spark):
    p = str(tmp_path / "mixed.warc")
    info = W.warc_record_bytes(
        "warcinfo", {"WARC-Record-ID": "<urn:uuid:0>"}, b"software: test\r\n"
    )
    req = W.warc_record_bytes(
        "request",
        {"WARC-Target-URI": "https://ex.com/p/0", "WARC-Record-ID": "<urn:uuid:1>"},
        b"GET /p/0 HTTP/1.1\r\n\r\n",
    )
    rows = _rows(2)
    with open(p, "wb") as f:
        f.write(info)
        f.write(req)
        for url, ts, html in rows:
            f.write(W.response_record_bytes(url, ts, html))
    out = W.read_warc(spark, p).orderBy("url").collect()
    assert [r["url"] for r in out] == [u for u, _, _ in rows]
    assert all(r["http_status"] == 200 and r["mime"] == "text/html" for r in out)
    assert [bytes(r["html"]) for r in out] == [h for _, _, h in rows]


def test_export_read_roundtrip_distributed(tmp_path, spark):
    docs = gen_documents(spark, 120, n_partitions=4)
    out_dir = str(tmp_path / "warc")
    manifest = W.export_warc(docs, out_dir, n_files=3)
    assert sum(n for _, n in manifest) == 120
    assert len(manifest) == 3

    back = W.read_warc(spark, out_dir, glob="*.warc.gz")
    got = {
        r["url"]: (bytes(r["html"]), r["warc_ts"])
        for r in back.collect()
    }
    want = {
        r["url"]: (bytes(r["html"]), r["warc_ts"])
        for r in docs.collect()
    }
    assert got == want  # byte + timestamp identity, whole corpus


def test_export_is_partitioning_invariant(tmp_path, spark):
    docs = gen_documents(spark, 60, n_partitions=2)
    docs8 = gen_documents(spark, 60, n_partitions=8)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    W.export_warc(docs, d1, n_files=2)
    W.export_warc(docs8, d2, n_files=2)
    for fn in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, fn), "rb").read() == open(
            os.path.join(d2, fn), "rb"
        ).read()


def test_warc_to_documents_matches_canonical_extractor(tmp_path, spark):
    docs = gen_documents(spark, 80, n_partitions=4)
    out_dir = str(tmp_path / "warc")
    W.export_warc(docs, out_dir, n_files=2)
    redocs = W.warc_to_documents(spark, out_dir)
    got = {r["url"]: (r["text"], r["lang"]) for r in redocs.collect()}
    for r in docs.collect():
        text, lang = got[r["url"]]
        assert text == extract_text(bytes(r["html"]))  # byte-identical invariant
        assert text == r["text"]
    assert redocs.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_gunzip_members_truncated_final_member():
    import io

    rows = _rows(2)
    full = W._gzip_member(
        W.response_record_bytes(*rows[0])
    ) + W._gzip_member(W.response_record_bytes(*rows[1]))
    cut = full[:-20]  # torn second member
    data = W.gunzip_members(cut)
    assert len(list(W.iter_warc_records(data))) >= 1


def test_build_index_cli_from_warc(tmp_path, spark, capsys):
    """jobs/build_index.py --warc: WARC dir -> analyzed index -> the
    planted needles are searchable (the full CLI ingest path)."""
    import json

    from jobs.build_index import main as build_main

    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    docs = gen_documents(spark, 200, n_partitions=4)
    warc_dir = str(tmp_path / "warc")
    W.export_warc(docs, warc_dir, n_files=2)
    out = str(tmp_path / "idx")
    build_main([
        "--warc", warc_dir, "--output", out, "--n-buckets", "4",
        "--stopwords", "english", "--fold",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 200
    idx = Index.load(spark, out)
    assert tuple(idx.stats.stopwords) and bool(idx.stats.fold)
    assert search_topk(idx, "needle7", k=10).count() == 3


def test_stream_warc_to_incremental_index(tmp_path, spark):
    """The crawl→index loop: WARC archives land in a dir, stream_warc
    parses them incrementally, the delta sink + compaction yield a
    searchable index with the planted needles."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk
    from hadoop_search_engine_spark.streaming.incremental import (
        compact_deltas,
        incremental_tf_sink,
    )
    from hadoop_search_engine_spark.sources.warc import stream_warc

    docs = gen_documents(spark, 150, n_partitions=4)
    warc_dir = str(tmp_path / "crawl")
    W.export_warc(docs, warc_dir, n_files=3)

    stream = stream_warc(spark, warc_dir, max_files=1)
    delta = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    q = (
        incremental_tf_sink(stream, delta, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = str(tmp_path / "idx")
    compact_deltas(spark, delta, out, n_buckets=4)
    from hadoop_search_engine_spark.operators.query_exec import Index

    idx = Index.load(spark, out)
    hits = search_topk(idx, "needle7", k=10)
    assert hits.count() == 3


def test_pipeline_cli_end_to_end(tmp_path, spark, capsys):
    """jobs/pipeline.py: WARC -> curated analyzed index -> alias flip;
    a second run builds gen-1 and retires gen-0."""
    import json

    from jobs.pipeline import main as pipeline_main

    from hadoop_search_engine_spark.operators.aliases import resolve_alias
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    docs = gen_documents(spark, 150, n_partitions=4)
    warc_dir = str(tmp_path / "crawl")
    W.export_warc(docs, warc_dir, n_files=2)
    work = str(tmp_path / "work")

    def run(argv):
        pipeline_main(argv)
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run(["--warc", warc_dir, "--workdir", work,
               "--url-dedup", "--stopwords", "english", "--fold",
               "--n-buckets", "4", "--alias", "live"])
    assert out["generation"] == 0 and out["retired_generation"] == []
    assert out["n_docs"] == 150
    assert resolve_alias(work, "live") == [out["index"]]
    idx = Index.load(spark, out["index"])
    assert tuple(idx.stats.stopwords) and bool(idx.stats.fold)
    assert search_topk(idx, "needle7", k=10).count() == 3

    out2 = run(["--warc", warc_dir, "--workdir", work,
                "--n-buckets", "4", "--alias", "live"])
    assert out2["generation"] == 1
    assert out2["retired_generation"] == [out["index"]]
    assert resolve_alias(work, "live") == [out2["index"]]
