"""Reshard/relayout from postings (no corpus re-tokenize): query
results must be rank- and score-identical to the source index."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.index_maint import (
    delete_docs,
    index_to_events,
    reshard_index,
)
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    phrase_search,
    search_topk,
)

ROWS = [
    (i, f"spark {'merge ' * (i % 4)}query {'table ' * (i % 3)}w{i} fast")
    for i in range(60)
]
QUERIES = ["spark merge", "query", "table fast", "w7", "absentterm"]


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("rs_src") / "idx")
    build_index(spark, docs, out, n_buckets=4, block_size=8,
                shard_span=16, positions=True)
    return Index.load(spark, out)


def _all(idx, q, **kw):
    return [(r["doc_id"], round(r["score"], 9))
            for r in search_topk(idx, q, k=1000, **kw).collect()]


def test_events_roundtrip_counts(spark, src):
    from collections import Counter

    from hadoop_search_engine_spark.functions.tokenizer import tokenize

    ev = index_to_events(src).collect()
    want = Counter()
    for i, t in ROWS:
        for tok in tokenize(t):
            want[(i, tok)] += 1
    got = Counter((r["doc_id"], r["term"]) for r in ev)
    assert got == want
    # doc_len constant per doc and equals token count
    dl = {r["doc_id"]: r["doc_len"] for r in ev}
    for i, t in ROWS:
        assert dl[i] == len(tokenize(t))


def test_reshard_scores_identical(spark, src, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rs_out") / "idx")
    stats = reshard_index(spark, src.out_dir, out,
                          shard_span=64, n_buckets=8, block_size=32)
    nd = Index.load(spark, out)
    assert stats.shard_span == 64 and stats.n_buckets == 8
    for q in QUERIES:
        assert _all(nd, q) == _all(src, q), q
        assert _all(nd, q, mode="and") == _all(src, q, mode="and"), q
    # positional blocks survived the relayout
    a = [(r["doc_id"], round(r["score"], 9))
         for r in phrase_search(src, "spark merge", k=100).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in phrase_search(nd, "spark merge", k=100).collect()]
    assert a == b and a


def test_reshard_vacuums_tombstones(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    s = str(tmp_path_factory.mktemp("rs_tomb") / "src")
    build_index(spark, docs, s, n_buckets=4, block_size=8, shard_span=16)
    idx = Index.load(spark, s)
    delete_docs(idx, [0, 2, 4])
    out = str(tmp_path_factory.mktemp("rs_tomb") / "out")
    reshard_index(spark, s, out, shard_span=64)
    nd = Index.load(spark, out)
    assert nd.tombstone_count() == 0
    hit_docs = {r["doc_id"] for r in search_topk(nd, "spark", k=1000).collect()}
    assert not {0, 2, 4} & hit_docs
    # fresh-build parity: scores equal an index built over the survivors
    f = str(tmp_path_factory.mktemp("rs_tomb") / "fresh")
    build_index(
        spark,
        docs.where(~docs.doc_id.isin([0, 2, 4])),
        f, n_buckets=4, block_size=8, shard_span=64,
    )
    fresh = Index.load(spark, f)
    for q in QUERIES:
        assert _all(nd, q) == _all(fresh, q), q


def test_reshard_cannot_add_positions(spark, tmp_path_factory):
    docs = spark.createDataFrame(ROWS[:10], "doc_id long, text string")
    s = str(tmp_path_factory.mktemp("rs_nopos") / "src")
    build_index(spark, docs, s, n_buckets=4, shard_span=16)  # no positions
    with pytest.raises(ValueError, match="no positions"):
        reshard_index(spark, s, s + "_out", positions=True)


def test_reshard_can_drop_positions(spark, src, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rs_drop") / "idx")
    stats = reshard_index(spark, src.out_dir, out, shard_span=64,
                          positions=False)
    assert not stats.positions
    nd = Index.load(spark, out)
    assert _all(nd, "spark merge") == _all(src, "spark merge")
    with pytest.raises(ValueError, match="positional"):
        phrase_search(nd, "spark merge")


def test_reshard_refuses_in_place(spark, src):
    with pytest.raises(ValueError, match="own source"):
        reshard_index(spark, src.out_dir, src.out_dir)


def test_prune_index_keeps_scores_for_surviving_terms(spark, src, tmp_path_factory):
    """Static pruning: queries over kept terms score IDENTICALLY to
    the source (carried doc_len, unchanged statistics, no doc lost);
    pruned terms behave like absent terms."""
    from hadoop_search_engine_spark.operators.index_maint import prune_index

    out = str(tmp_path_factory.mktemp("pr") / "idx")
    # every doc has 'spark'+'query'+'fast' (df=60); w{i} terms are df=1.
    # Prune the hapax tail: min_df=2 drops every w{i}.
    prune_index(spark, src.out_dir, out, min_df=2)
    nd = Index.load(spark, out)
    for q in ("spark merge", "query", "table fast"):
        assert _all(nd, q) == _all(src, q), q
    # pruned term: behaves like an absent term (no hits on its own,
    # ignored in OR queries)
    assert _all(nd, "w7") == []
    assert _all(nd, "spark w7") == _all(nd, "spark")
    # lexicon actually shrank
    assert nd.lexicon.count() < src.lexicon.count()


def test_prune_index_max_df_ratio_drops_head_terms(spark, src, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_maint import prune_index

    out = str(tmp_path_factory.mktemp("pr2") / "idx")
    # 'spark'/'query'/'fast' appear in all 60 docs -> ratio 1.0; drop them
    prune_index(spark, src.out_dir, out, max_df_ratio=0.9)
    nd = Index.load(spark, out)
    assert _all(nd, "spark") == []
    # mid-df terms survive with identical scores (all docs retain terms)
    assert _all(nd, "merge") == _all(src, "merge")


def test_prune_index_validation(spark, src):
    from hadoop_search_engine_spark.operators.index_maint import prune_index

    with pytest.raises(ValueError, match="min_df/max_df"):
        prune_index(spark, src.out_dir, src.out_dir + "_p")
    with pytest.raises(ValueError, match="own source"):
        prune_index(spark, src.out_dir, src.out_dir, min_df=2)


def test_reshard_and_prune_are_fsck_clean(spark, src, tmp_path_factory):
    """Relayout/prune outputs pass the full integrity verification
    (lineage counters vs postings, lexicon vs rollup, block layout,
    doc_stats vs header, sampled decode)."""
    from hadoop_search_engine_spark.operators.fsck import verify_index
    from hadoop_search_engine_spark.operators.index_maint import prune_index

    base = tmp_path_factory.mktemp("fsckrp")
    rs = str(base / "rs")
    reshard_index(spark, src.out_dir, rs, shard_span=64, n_buckets=8)
    pr = str(base / "pr")
    prune_index(spark, src.out_dir, pr, min_df=2)
    for d in (rs, pr):
        rep = verify_index(Index.load(spark, d), sample_fraction=1.0)
        bad = {k: v for k, v in rep.items()
               if isinstance(v, dict) and not v.get("ok", True)}
        assert not bad, (d, bad)
