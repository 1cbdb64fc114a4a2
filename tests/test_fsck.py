"""Index fsck: clean indexes verify, corrupted ones are flagged.

The lifecycle half doubles as a lineage-consistency guard: delete,
vacuum, and physical merge must each leave an index whose checkpoints,
lexicon, layout keys, and blobs still verify — if a maintenance path
ever stops keeping the counters true, fsck (and this test) fails.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_search_engine_spark.operators.fsck import verify_index
from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import Index


def _failed(report: dict) -> set[str]:
    return {k for k, v in report["checks"].items() if not v["ok"]}


def _copy(idx: Index, tmp_path, name: str) -> Index:
    dst = str(tmp_path / name)
    shutil.copytree(idx.out_dir, dst)
    return Index.load(idx.spark, dst)


def test_clean_index_verifies(tiny_index):
    report = verify_index(tiny_index, sample_fraction=1.0)
    assert report["ok"], report


def test_positional_and_lifecycle_verify(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_maint import (
        delete_docs,
        merge_indexes,
        vacuum_index,
    )

    rows_a = [(i, f"alpha beta w{i} gamma delta") for i in range(40)]
    rows_b = [(i, f"alpha epsilon w{i} zeta") for i in range(40)]
    a_docs = spark.createDataFrame(rows_a, "doc_id long, text string")
    b_docs = spark.createDataFrame(rows_b, "doc_id long, text string")
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a_docs, a_dir, shard_span=16, n_buckets=4,
                block_size=8, positions=True)
    build_index(spark, b_docs, b_dir, shard_span=16, n_buckets=4,
                block_size=8, positions=True)
    a = Index.load(spark, a_dir)
    assert verify_index(a, sample_fraction=1.0)["ok"]

    delete_docs(a, [3, 7])
    rep = verify_index(Index.load(spark, a_dir), sample_fraction=1.0)
    assert rep["ok"], rep

    vacuumed = vacuum_index(Index.load(spark, a_dir))
    rep = verify_index(vacuumed, sample_fraction=1.0)
    assert rep["ok"], rep

    merged = merge_indexes(spark, [a_dir, b_dir], str(tmp_path / "m"))
    rep = verify_index(merged, sample_fraction=1.0)
    assert rep["ok"], rep


def test_lost_postings_file_flagged(spark, tiny_index, tmp_path):
    idx = _copy(tiny_index, tmp_path, "lost")
    victim = sorted(glob.glob(
        os.path.join(idx.out_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    os.remove(victim)
    report = verify_index(idx, sample_fraction=1.0)
    assert not report["ok"]
    assert {"counters", "lexicon"} & _failed(report), report


def test_duplicated_postings_file_flagged(spark, tiny_index, tmp_path):
    idx = _copy(tiny_index, tmp_path, "dup")
    victim = sorted(glob.glob(
        os.path.join(idx.out_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    shutil.copy(victim, os.path.join(os.path.dirname(victim),
                                     "part-copy.parquet"))
    report = verify_index(idx, sample_fraction=1.0)
    assert not report["ok"]
    assert {"counters", "blocks", "lexicon"} & _failed(report), report


def test_corrupted_blob_metadata_flagged(spark, tiny_index, tmp_path):
    idx = _copy(tiny_index, tmp_path, "rot")
    victim = sorted(glob.glob(
        os.path.join(idx.out_dir, "postings", "bucket=*", "*.parquet")
    ))[0]
    t = pq.read_table(victim)
    i = t.schema.get_field_index("n_docs")
    vals = t.column(i).to_pylist()
    vals[0] = int(vals[0]) + 1  # one block now lies about its length
    t = t.set_column(i, t.schema.field(i),
                     pa.array(vals, type=t.schema.field(i).type))
    pq.write_table(t, victim)
    # drop Hadoop's local-FS checksum sidecar: the corruption should be
    # caught by fsck's decode invariants, not a transport-layer CRC
    crc = os.path.join(os.path.dirname(victim),
                       "." + os.path.basename(victim) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    report = verify_index(idx, sample_fraction=1.0)
    assert not report["ok"]
    assert "decode" in _failed(report), report


def test_corrupted_stats_header_flagged(spark, tiny_index, tmp_path):
    import json

    idx = _copy(tiny_index, tmp_path, "hdr")
    stats_path = os.path.join(idx.out_dir, "stats.json")
    if not os.path.exists(stats_path):
        candidates = glob.glob(os.path.join(idx.out_dir, "*stats*"))
        stats_path = [c for c in candidates if os.path.isfile(c)][0]
    blob = json.load(open(stats_path))
    blob["n_docs"] = int(blob["n_docs"]) + 1
    json.dump(blob, open(stats_path, "w"))
    report = verify_index(Index.load(spark, idx.out_dir),
                          sample_fraction=1.0)
    assert not report["ok"]
    assert "doc_stats" in _failed(report), report


def test_out_of_range_tombstone_flagged(spark, tiny_index, tmp_path):
    idx = _copy(tiny_index, tmp_path, "tomb")
    bad = spark.createDataFrame(
        [(idx.stats.shard_span * idx.stats.num_shards + 5,)], "doc_id long"
    )
    bad.write.mode("overwrite").parquet(
        os.path.join(idx.out_dir, "tombstones")
    )
    report = verify_index(Index.load(spark, idx.out_dir),
                          sample_fraction=1.0)
    assert not report["ok"]
    assert "tombstones" in _failed(report), report


def test_fsck_cli(spark, tiny_index, capsys):
    import jobs.fsck as job

    rc = job.main(["--index", tiny_index.out_dir, "--sample", "1.0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"ok": true' in out
