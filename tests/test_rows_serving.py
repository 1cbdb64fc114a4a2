"""search_topk_rows: the no-DataFrame driver serving fast path.

Wrapping k result rows into a Spark DataFrame costs ~10-20 ms of py4j
round trips per query; an online search node wants plain pairs. The
contract: rank- AND score-identical to search_topk on every input —
including tuned (k1, b), conjunctive mode, tombstones, and empty
results — with the same driver-serving eligibility gates.
"""

from __future__ import annotations

import math

import pytest

import hadoop_search_engine_spark.operators.query_exec as qe
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    _empty_df,
    search_topk,
    search_topk_rows,
)

QUERIES = [
    ("w00000", "or"), ("w00001 w00200 w04000", "or"),
    ("needle7", "or"), ("needle7 w00000", "and"),
    ("W00006!!", "or"), ("zzzz-nothere", "or"),
    ("w00003 zzzz-nothere", "and"), ("", "or"),
]


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _same(got, want, label):
    assert len(got) == len(want), f"{label}: {got} vs {want}"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd, f"{label}: {got} vs {want}"
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-12), label


def test_rows_identical_to_dataframe_path(tiny_index):
    for q, mode in QUERIES:
        want = _pairs(search_topk(tiny_index, q, k=7, mode=mode,
                                  serving="driver"))
        got = search_topk_rows(tiny_index, q, k=7, mode=mode)
        _same(got, want, f"{q}/{mode}")
        # and repeated (hot postings LRU) stays identical
        _same(search_topk_rows(tiny_index, q, k=7, mode=mode), want,
              f"{q}/{mode} hot")


def test_rows_tuned_parameters(tiny_index):
    q = "w00000 w00010"
    want = _pairs(search_topk(tiny_index, q, k=5, serving="driver",
                              k1=0.9, b=0.25))
    _same(search_topk_rows(tiny_index, q, k=5, k1=0.9, b=0.25), want,
          "tuned")


def test_rows_respects_tombstones(spark, tiny_index, tmp_path):
    import shutil

    from hadoop_search_engine_spark.operators.index_maint import delete_docs

    mine = str(tmp_path / "idx")
    shutil.copytree(tiny_index.out_dir, mine)
    idx = Index.load(spark, mine)
    q = "w00000"
    before = search_topk_rows(idx, q, k=5)
    delete_docs(idx, [before[0][0]])
    after = search_topk_rows(idx, q, k=5)
    assert all(d != before[0][0] for d, _ in after)
    _same(after, _pairs(search_topk(idx, q, k=5, serving="driver")),
          "post-delete")


def test_rows_gates_match_driver_serving(spark, tiny_index, tmp_path,
                                         monkeypatch):
    # oversized index -> same ValueError as serving="driver"
    monkeypatch.setattr(qe, "DL_BROADCAST_MAX_DOCS", 1)
    fresh = Index.load(spark, tiny_index.out_dir)
    with pytest.raises(ValueError, match="too large for driver serving"):
        search_topk_rows(fresh, "w00000", k=3)
    monkeypatch.undo()

    # oversized tombstone set -> same ValueError as the driver gate
    import shutil

    from hadoop_search_engine_spark.operators.index_maint import delete_docs

    mine = str(tmp_path / "idx2")
    shutil.copytree(tiny_index.out_dir, mine)
    idx = Index.load(spark, mine)
    delete_docs(idx, [0, 1, 2])
    monkeypatch.setattr(qe, "TOMBSTONE_OVERFETCH_MAX", 2)
    with pytest.raises(ValueError, match="tombstone set past"):
        search_topk_rows(idx, "w00000", k=3)


def test_rows_validation_errors(tiny_index):
    with pytest.raises(ValueError, match="mode must be"):
        search_topk_rows(tiny_index, "w00000", mode="xor")
    with pytest.raises(ValueError, match="algorithm must be"):
        search_topk_rows(tiny_index, "w00000", algorithm="bogus")


def test_empty_df_plan_is_cached_per_session_and_schema(spark):
    a = _empty_df(spark, "doc_id long, score double")
    b = _empty_df(spark, "doc_id long, score double")
    c = _empty_df(spark, "x int")
    assert a is b
    assert a is not c
    assert a.count() == 0 and c.count() == 0
    assert [f.name for f in c.schema.fields] == ["x"]


def test_federated_rows_identical_to_dataframe_path(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_segments,
        search_topk_segments_rows,
    )

    rows_a = [(i, f"alpha beta w{i % 7} gamma") for i in range(30)]
    rows_b = [(i, f"alpha delta w{i % 5} epsilon gamma") for i in range(30)]
    segs = []
    for name, rows in (("a", rows_a), ("b", rows_b)):
        d = str(tmp_path / name)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, docs, d, shard_span=16, n_buckets=4, block_size=8)
        segs.append(Index.load(spark, d))
    for q, mode in [("alpha", "or"), ("alpha gamma", "and"),
                    ("w1 delta", "or"), ("beta epsilon", "and"),
                    ("zzz-absent", "or"), ("", "or")]:
        want = [
            (r["segment"], r["doc_id"], r["score"])
            for r in search_topk_segments(segs, q, k=6, mode=mode).collect()
        ]
        got = search_topk_segments_rows(segs, q, k=6, mode=mode)
        assert len(got) == len(want), (q, mode, got, want)
        for (gs, gd, gv), (ws, wd, wv) in zip(got, want):
            assert (gs, gd) == (ws, wd), (q, mode, got, want)
            assert math.isclose(gv, wv, rel_tol=1e-12, abs_tol=1e-12)


def test_warm_pins_serving_state_and_preserves_results(spark, tiny_index):
    fresh = Index.load(spark, tiny_index.out_dir)
    want = {
        q: search_topk_rows(fresh, q, k=5)
        for q in ("w00000", "needle7", "w00001 w00200")
    }
    idx = Index.load(spark, tiny_index.out_dir)
    summary = idx.warm(top_terms=20)
    assert summary["docs_pinned"] == idx.stats.n_docs
    assert summary["lexicon_terms"] > 0
    assert summary["terms_cached"] > 0
    assert summary["postings_cache_bytes"] > 0
    for q, w in want.items():
        _same(search_topk_rows(idx, q, k=5), w, f"warm {q}")


def test_warm_survives_disabled_cache(spark, tiny_index, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_POSTINGS_CACHE_MB", "0")
    idx = Index.load(spark, tiny_index.out_dir)
    summary = idx.warm(top_terms=5)
    assert summary["terms_cached"] == 0  # budget 0: nothing pinned
    assert search_topk_rows(idx, "w00000", k=3)


def test_batch_rows_identical_to_batch_dataframe(spark, tiny_index, tmp_path):
    import shutil

    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_batch,
        search_topk_batch_rows,
    )

    queries = {
        "head": "w00000",
        "multi": "w00001 w00200 w04000",
        "needle": "needle7 w00000",
        "noise": "W00006!!",
        "absent": "zzzz-nothere",
    }
    want: dict = {}
    for r in search_topk_batch(tiny_index, queries, k=5,
                               serving="driver").collect():
        want.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for v in want.values():
        v.sort(key=lambda p: (-p[1], p[0]))
    got = search_topk_batch_rows(tiny_index, queries, k=5)
    assert set(got) == set(want)
    for qid in want:
        _same(got[qid], want[qid], f"batch rows {qid}")
    # tuned parameters flow through identically
    tuned_df: dict = {}
    for r in search_topk_batch(tiny_index, queries, k=5, serving="driver",
                               k1=0.8, b=0.3).collect():
        tuned_df.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"])
        )
    for v in tuned_df.values():
        v.sort(key=lambda p: (-p[1], p[0]))
    tuned_rows = search_topk_batch_rows(tiny_index, queries, k=5,
                                        k1=0.8, b=0.3)
    for qid in tuned_df:
        _same(tuned_rows[qid], tuned_df[qid], f"tuned batch rows {qid}")
    # tombstones respected
    mine = str(tmp_path / "idx3")
    shutil.copytree(tiny_index.out_dir, mine)
    idx = Index.load(spark, mine)
    top = search_topk_batch_rows(idx, {"q": "w00000"}, k=3)["q"][0][0]
    delete_docs(idx, [top])
    after = search_topk_batch_rows(idx, {"q": "w00000"}, k=3)["q"]
    assert all(d != top for d, _ in after)
