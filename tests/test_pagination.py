"""Cursor pagination (search_after): page n+1 is exactly the next k
of the full ranking, on every serving path / algorithm / query type."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    phrase_search,
    search_topk,
    search_topk_rows,
)

# 40 docs, heavy term overlap so "spark merge" matches most of them
ROWS = [
    (i, f"spark {'merge ' * (i % 4)}query {'table ' * (i % 3)}spark fast")
    for i in range(40)
]


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("pidx") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=8, positions=True)
    return Index.load(spark, out)


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _walk_pages(fetch, page, total):
    """fetch(after) -> ordered pairs; walk cursors and concatenate."""
    got, after = [], None
    while len(got) < total:
        rows = fetch(after)
        if not rows:
            break
        got.extend(rows)
        after = rows[-1]
    return got


@pytest.mark.parametrize("serving", ["driver", "spark"])
@pytest.mark.parametrize("mode,algorithm", [
    ("or", "dense"), ("or", "wand"), ("and", "wand"), ("and", "dense"),
])
def test_pages_reconstruct_full_ranking(pidx, serving, mode, algorithm):
    full = _pairs(search_topk(pidx, "spark merge", k=1000, mode=mode,
                              algorithm=algorithm, serving=serving))
    assert len(full) >= 12  # enough matches to need >2 pages

    def fetch(after):
        return _pairs(search_topk(pidx, "spark merge", k=5, mode=mode,
                                  algorithm=algorithm, serving=serving,
                                  after=after))

    got = _walk_pages(fetch, 5, len(full))
    assert got == full
    # past the end: empty page, no error
    assert fetch(full[-1]) == []


def test_rows_path_pagination(pidx):
    full = search_topk_rows(pidx, "spark merge", k=1000)

    def fetch(after):
        return search_topk_rows(pidx, "spark merge", k=7, after=after)

    assert _walk_pages(fetch, 7, len(full)) == full


def test_phrase_pagination(pidx):
    full = _pairs(phrase_search(pidx, "spark merge", k=1000, slop=1))
    assert len(full) >= 6

    def fetch(after):
        return _pairs(phrase_search(pidx, "spark merge", k=4, slop=1,
                                    after=after))

    assert _walk_pages(fetch, 4, len(full)) == full


def test_pagination_with_tombstones(pidx, spark):
    """Cursor + tombstone over-fetch compose: pages over a deleted-doc
    index equal the filtered full ranking."""
    import shutil
    import tempfile

    from hadoop_search_engine_spark.operators.index_maint import delete_docs

    d = tempfile.mkdtemp(prefix="pgt_")
    try:
        out = d + "/idx"
        docs = spark.createDataFrame(ROWS, "doc_id long, text string")
        build_index(spark, docs, out, n_buckets=4, block_size=8)
        idx = Index.load(spark, out)
        delete_docs(idx, [1, 3, 5, 7])
        full = _pairs(search_topk(idx, "spark merge", k=40))
        assert not {1, 3, 5, 7} & {d_ for d_, _s in full}

        def fetch(after):
            return _pairs(search_topk(idx, "spark merge", k=6, after=after))

        assert _walk_pages(fetch, 6, len(full)) == full
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_after_cursor_validation(pidx):
    with pytest.raises(ValueError, match="cursor"):
        search_topk(pidx, "spark", after=3.5)
    with pytest.raises(ValueError, match="cursor"):
        search_topk_rows(pidx, "spark", after=(1.0,))


def test_mid_tie_cursor_is_exact(pidx):
    """Cursor landing inside a score-tie group resumes at the right
    doc_id (the total order is (score desc, doc_id asc))."""
    full = _pairs(search_topk(pidx, "spark merge", k=40))
    scores = [s for _d, s in full]
    # find a tie group (identical generated docs => identical scores)
    tie_at = next(
        (i for i in range(len(scores) - 1) if scores[i] == scores[i + 1]),
        None,
    )
    assert tie_at is not None, "fixture should produce score ties"
    after = full[tie_at]
    nxt = _pairs(search_topk(pidx, "spark merge", k=3, after=after))
    assert nxt == full[tie_at + 1 : tie_at + 4]


def test_federated_pagination(spark, tmp_path_factory):
    """Federated cursor (segment, doc_id, score): pages reconstruct the
    full cross-segment ranking on both the DataFrame and rows paths."""
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_segments,
        search_topk_segments_rows,
    )

    base = tmp_path_factory.mktemp("fpg")
    segs = []
    for s in range(2):
        rows = [
            (i, f"spark {'merge ' * ((i + s) % 4)}query fast")
            for i in range(20)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(base / f"seg{s}")
        build_index(spark, docs, out, n_buckets=4, block_size=8,
                    shard_span=512)
        segs.append(Index.load(spark, out))

    full = search_topk_segments_rows(segs, "spark merge", k=1000)
    assert len(full) >= 10

    got, after = [], None
    while True:
        page = search_topk_segments_rows(segs, "spark merge", k=6,
                                         after=after)
        if not page:
            break
        got.extend(page)
        after = page[-1]
    assert got == full

    # DataFrame path: page 2 via cursor == rows 7..12 of the full order
    p2 = search_topk_segments(segs, "spark merge", k=6,
                              after=full[5]).collect()
    assert [(r["segment"], r["doc_id"], r["score"]) for r in p2] == (
        full[6:12]
    )
