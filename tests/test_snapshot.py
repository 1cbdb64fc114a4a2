"""Snapshot / restore: point-in-time hardlink+manifest snapshots of a
built index (the ES snapshot / Lucene commit-point analog). The key
guarantee: later maintenance on the source (deletes, vacuum) never
reaches into a snapshot's bytes, so a restore serves the exact
pre-maintenance results."""

from __future__ import annotations

import json
import os

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.index_maint import (
    delete_docs,
    restore_snapshot,
    snapshot_index,
    vacuum_index,
    verify_snapshot,
)
from hadoop_search_engine_spark.operators.query_exec import Index, search_topk

QUERY = "w00001 w00002"


def _pairs(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.collect()]


@pytest.fixture()
def snap_index(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "src")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=4, n_buckets=8, block_size=16)
    return Index.load(spark, out)


def test_snapshot_restore_roundtrip(spark, snap_index, tmp_path):
    snap = str(tmp_path / "snap")
    m = snapshot_index(snap_index.out_dir, snap)
    assert m["n_files"] == len(m["files"]) > 0
    assert m["total_bytes"] > 0
    v = verify_snapshot(snap)
    assert v["ok"] and v["errors"] == []

    before = _pairs(search_topk(snap_index, QUERY, k=10))
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    got = _pairs(search_topk(Index.load(spark, dst), QUERY, k=10))
    assert got == before and len(got) > 0


def test_snapshot_survives_source_maintenance(spark, snap_index, tmp_path):
    """Delete + vacuum the SOURCE after snapshotting: the snapshot
    still verifies, and its restore serves the pre-delete results."""
    before = _pairs(search_topk(snap_index, QUERY, k=10))
    victim = before[0][0]
    snap = str(tmp_path / "snap")
    snapshot_index(snap_index.out_dir, snap)

    delete_docs(snap_index, [victim])
    vacuum_index(snap_index)
    after = _pairs(search_topk(Index.load(spark, snap_index.out_dir),
                               QUERY, k=10))
    assert victim not in [d for d, _ in after]

    assert verify_snapshot(snap)["ok"]
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    got = _pairs(search_topk(Index.load(spark, dst), QUERY, k=10))
    assert got == before
    assert victim in [d for d, _ in got]


def test_verify_detects_corruption_and_restore_refuses(snap_index, tmp_path):
    snap = str(tmp_path / "snap")
    snapshot_index(snap_index.out_dir, snap)
    # bit-rot one manifested data file (rewrite, NOT in place — the
    # source index must keep its inode intact)
    with open(os.path.join(snap, "snapshot.json")) as f:
        rel = json.load(f)["files"][0]["path"]
    p = os.path.join(snap, rel)
    buf = bytearray(open(p, "rb").read())
    buf[len(buf) // 2] ^= 0xFF
    os.unlink(p)
    open(p, "wb").write(bytes(buf))

    v = verify_snapshot(snap)
    assert not v["ok"] and any("crc" in e for e in v["errors"])
    with pytest.raises(ValueError, match="verification"):
        restore_snapshot(snap, str(tmp_path / "restored"))


def test_verify_detects_missing_and_extra_files(snap_index, tmp_path):
    snap = str(tmp_path / "snap")
    snapshot_index(snap_index.out_dir, snap)
    with open(os.path.join(snap, "snapshot.json")) as f:
        rel = json.load(f)["files"][0]["path"]
    os.unlink(os.path.join(snap, rel))
    open(os.path.join(snap, "stray.bin"), "wb").write(b"x")
    v = verify_snapshot(snap)
    msgs = " | ".join(v["errors"])
    assert not v["ok"]
    assert "missing file" in msgs and "unmanifested" in msgs


def test_snapshot_and_restore_refuse_nonempty_targets(snap_index, tmp_path):
    snap = str(tmp_path / "snap")
    snapshot_index(snap_index.out_dir, snap)
    with pytest.raises(FileExistsError):
        snapshot_index(snap_index.out_dir, snap)
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    with pytest.raises(FileExistsError):
        restore_snapshot(snap, dst)


def test_snapshot_tombstoned_index_preserves_delete_semantics(
    spark, snap_index, tmp_path
):
    """Snapshot AFTER a delete (before vacuum): the tombstones dir
    rides along, so the restore serves the post-delete results."""
    before = _pairs(search_topk(snap_index, QUERY, k=10))
    victim = before[0][0]
    delete_docs(snap_index, [victim])
    deleted_view = _pairs(
        search_topk(Index.load(spark, snap_index.out_dir), QUERY, k=10)
    )
    assert victim not in [d for d, _ in deleted_view]

    snap = str(tmp_path / "snap")
    snapshot_index(snap_index.out_dir, snap)
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    got = _pairs(search_topk(Index.load(spark, dst), QUERY, k=10))
    assert got == deleted_view


def test_snapshot_positional_index_phrase_roundtrip(
    spark, tiny_corpus, tmp_path
):
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    out = str(tmp_path / "possrc")
    build_index(spark, tiny_corpus.select("doc_id", "text"), out,
                num_shards=4, n_buckets=8, block_size=16, positions=True)
    idx = Index.load(spark, out)
    # a real adjacent word pair from doc 0
    first = tiny_corpus.where("doc_id = 0").first()["text"].split()[:2]
    phrase = " ".join(first)
    before = _pairs(phrase_search(idx, phrase, k=10))
    assert before  # the source doc itself matches

    snap = str(tmp_path / "snap")
    snapshot_index(out, snap)
    assert verify_snapshot(snap)["ok"]
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    assert _pairs(phrase_search(Index.load(spark, dst), phrase, k=10)) \
        == before


def test_snapshot_merged_index_with_segments_json(
    spark, tiny_corpus, tmp_path
):
    """A merged index carries segments.json; the snapshot must keep it
    (federated doc_id offsets die without it)."""
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.index_maint import (
        merge_indexes,
    )

    half = 100
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    docs = tiny_corpus.select("doc_id", "text")
    build_index(spark, docs.where(F.col("doc_id") < half), a_dir,
                shard_span=512, n_buckets=8, block_size=16)
    build_index(
        spark,
        docs.where(F.col("doc_id") >= half)
        .withColumn("doc_id", F.col("doc_id") - F.lit(half)),
        b_dir, shard_span=512, n_buckets=8, block_size=16,
    )
    merged = str(tmp_path / "merged")
    merge_indexes(spark, [a_dir, b_dir], merged)
    before = _pairs(search_topk(Index.load(spark, merged), QUERY, k=10))

    snap = str(tmp_path / "snap")
    snapshot_index(merged, snap)
    assert os.path.exists(os.path.join(snap, "segments.json"))
    dst = str(tmp_path / "restored")
    restore_snapshot(snap, dst)
    assert os.path.exists(os.path.join(dst, "segments.json"))
    assert _pairs(search_topk(Index.load(spark, dst), QUERY, k=10)) \
        == before
