"""Federated multi-segment search: global BM25 statistics across
segments make results identical to a single index built over the
union corpus — the serving model for base + uncompacted streaming
deltas (the reference rebuilds and restarts its server instead,
README.md:443-446)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.index_maint import delete_docs
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    search_topk,
    search_topk_segments,
)

QUERIES = ["needle7", "w00001 w00002", "w00000", "w00003 w00010 w00200"]


def _single(df):
    return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]


def _multi(df):
    return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]


@pytest.fixture(scope="module")
def segmented(spark, tiny_corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("segments")
    full_dir = str(base / "full")
    build_index(spark, tiny_corpus.select("doc_id", "text"), full_dir,
                num_shards=4, n_buckets=8, block_size=16)
    seg_dirs = []
    for i in range(2):
        d = str(base / f"seg{i}")
        part = tiny_corpus.where(F.col("doc_id") % 2 == i)
        build_index(spark, part.select("doc_id", "text"), d,
                    num_shards=4, n_buckets=8, block_size=16)
        seg_dirs.append(d)
    return (
        Index.load(spark, full_dir),
        [Index.load(spark, d) for d in seg_dirs],
    )


def test_segments_match_union_index(segmented):
    full, segs = segmented
    for q in QUERIES:
        for mode in ("or", "and"):
            want = _single(search_topk(full, q, k=10, mode=mode))
            got = _multi(search_topk_segments(segs, q, k=10, mode=mode))
            assert [d for d, _ in got] == [d for d, _ in want], (q, mode)
            for (_, gs), (_, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-12), (q, mode)


def test_single_segment_degenerates_to_search_topk(segmented):
    full, _ = segmented
    for q in QUERIES:
        want = _single(search_topk(full, q, k=10))
        got = _multi(search_topk_segments([full], q, k=10))
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_segments_empty_and_absent(segmented):
    _, segs = segmented
    assert search_topk_segments(segs, "").count() == 0
    assert search_topk_segments(segs, "zzzzq").count() == 0
    assert search_topk_segments(segs, "w00000 zzzzq", mode="and").count() == 0


def test_segments_respect_tombstones(spark, tiny_corpus, tmp_path):
    base = tmp_path
    dirs = []
    for i in range(2):
        d = str(base / f"s{i}")
        part = tiny_corpus.where(F.col("doc_id") % 2 == i)
        build_index(spark, part.select("doc_id", "text"), d,
                    num_shards=4, n_buckets=8, block_size=16)
        dirs.append(d)
    segs = [Index.load(spark, d) for d in dirs]
    before = _multi(search_topk_segments(segs, "needle7", k=5))
    assert before
    dead_doc = before[0][0]
    seg_of_dead = dead_doc % 2
    delete_docs(segs[seg_of_dead], [dead_doc])
    after = _multi(search_topk_segments(segs, "needle7", k=5))
    assert dead_doc not in {d for d, _ in after}
    assert [d for d, _ in after] == [d for d, _ in before if d != dead_doc]


@pytest.mark.parametrize("serving", ["driver", "spark"])
@pytest.mark.parametrize("mode", ["or", "and"])
def test_segments_batch_matches_per_query(segmented, serving, mode):
    """Federated batch serving: per query bit-identical to per-query
    search_topk_segments (global stats, per-segment batch pass)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_segments_batch,
    )

    _, segs = segmented
    qs = {f"q{i}": q for i, q in enumerate(QUERIES + ["zzz absent", ""])}
    got: dict[str, list] = {}
    rows = search_topk_segments_batch(
        segs, qs, k=10, mode=mode, serving=serving
    ).collect()
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["segment"], r["doc_id"], r["score"])
        )
    for qid, text in qs.items():
        want = [
            (r["segment"], r["doc_id"], r["score"])
            for r in search_topk_segments(
                segs, text, k=10, mode=mode, serving=serving
            ).collect()
        ]
        assert got.get(qid, []) == want, (qid, text, mode, serving)
