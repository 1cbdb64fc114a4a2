"""scored_docs (all matched, full scores) and weighted multi-field
search (BM25F-lite) vs per-field search_topk ground truth."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.operators.index_build import build_index
from hadoop_search_engine_spark.operators.query_exec import (
    Index,
    scored_docs,
    search_topk,
    search_topk_fields,
)

BODY = [
    (i, f"spark {'merge ' * (i % 4)}query {'table ' * (i % 3)}fast")
    for i in range(30)
]
TITLE = [
    (i, f"{'spark ' if i % 5 == 0 else ''}doc number w{i}")
    for i in range(30)
]


@pytest.fixture(scope="module")
def fidx(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fields")
    out = {}
    for name, rows in (("body", BODY), ("title", TITLE)):
        d = str(base / name)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, docs, d, n_buckets=4, block_size=8, shard_span=16)
        out[name] = Index.load(spark, d)
    return out


def test_scored_docs_equals_full_topk(fidx):
    idx = fidx["body"]
    all_rows = {r["doc_id"]: r["score"]
                for r in scored_docs(idx, "spark merge").collect()}
    top_all = {r["doc_id"]: r["score"]
               for r in search_topk(idx, "spark merge", k=10_000,
                                    serving="spark").collect()}
    assert all_rows == top_all
    assert len(all_rows) > 10


def test_scored_docs_and_mode(fidx):
    idx = fidx["body"]
    got = {r["doc_id"] for r in scored_docs(idx, "spark merge",
                                            mode="and").collect()}
    want = {r["doc_id"] for r in search_topk(idx, "spark merge", k=10_000,
                                             mode="and").collect()}
    assert got == want


def test_multi_field_weighted_sum(fidx):
    body, title = fidx["body"], fidx["title"]
    w_body, w_title = 1.0, 2.5
    got = search_topk_fields(
        [(body, w_body), (title, w_title)], "spark", k=30
    ).collect()
    b = {r["doc_id"]: r["score"]
         for r in scored_docs(body, "spark").collect()}
    t = {r["doc_id"]: r["score"]
         for r in scored_docs(title, "spark").collect()}
    want = {
        d: w_body * b.get(d, 0.0) + w_title * t.get(d, 0.0)
        for d in set(b) | set(t)
    }
    want_order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want_order
    ]
    # title-only matches (i % 5 == 0 docs w/o body 'spark'? body always
    # has spark here, so check the boost actually reorders)
    assert any(d % 5 == 0 and want[d] > max(b.values()) for d in want)


def test_multi_field_doc_outside_every_field_topk_can_win(spark, tmp_path_factory):
    """The case per-field top-k over-fetch would miss: a doc mediocre
    in BOTH fields beats docs strong in only one."""
    base = tmp_path_factory.mktemp("f2")
    # doc 0: strong in A only; doc 1: strong in B only; doc 2: medium both
    a_rows = [(0, "hit hit hit hit"), (1, "filler words only"), (2, "hit hit pad pad")]
    b_rows = [(0, "filler words only"), (1, "hit hit hit hit"), (2, "hit hit pad pad")]
    idx = {}
    for name, rows in (("a", a_rows), ("b", b_rows)):
        d = str(base / name)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        build_index(spark, docs, d, n_buckets=4, shard_span=16)
        idx[name] = Index.load(spark, d)
    top = search_topk_fields([(idx["a"], 1.0), (idx["b"], 1.0)], "hit",
                             k=1).collect()
    a = {r["doc_id"]: r["score"] for r in scored_docs(idx["a"], "hit").collect()}
    b = {r["doc_id"]: r["score"] for r in scored_docs(idx["b"], "hit").collect()}
    want = max(
        ((d, a.get(d, 0) + b.get(d, 0)) for d in set(a) | set(b)),
        key=lambda kv: (kv[1], -kv[0]),
    )
    assert (top[0]["doc_id"], round(top[0]["score"], 9)) == (
        want[0], round(want[1], 9)
    )
    assert top[0]["doc_id"] == 2  # the both-fields doc wins


def test_fields_validation(fidx):
    with pytest.raises(ValueError, match="field"):
        search_topk_fields([], "spark")


def test_boosted_topk_matches_manual_fusion(fidx, spark):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import boosted_topk

    idx = fidx["body"]
    boosts = spark.range(30).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("boost"),
    )
    got = boosted_topk(idx, "spark merge", boosts, k=30,
                       boost_weight=0.5).collect()
    sd = {r["doc_id"]: r["score"]
          for r in scored_docs(idx, "spark merge").collect()}
    want = sorted(
        ((d, s + 0.5 * (d % 7)) for d, s in sd.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (d, round(s, 9)) for d, s in want
    ]
    # the boost actually reorders vs plain BM25
    plain = [r["doc_id"] for r in search_topk(idx, "spark merge", k=30).collect()]
    assert [r["doc_id"] for r in got] != plain


def test_boosted_topk_missing_docs_get_zero(fidx, spark):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import boosted_topk

    idx = fidx["body"]
    boosts = spark.createDataFrame([(0, 100.0)], "doc_id long, boost double")
    got = boosted_topk(idx, "spark merge", boosts, k=5).collect()
    assert got[0]["doc_id"] == 0  # massively boosted doc wins
    sd = {r["doc_id"]: r["score"]
          for r in scored_docs(idx, "spark merge").collect()}
    assert got[0]["score"] == pytest.approx(sd[0] + 100.0)
    assert got[1]["score"] == pytest.approx(
        max(s for d, s in sd.items() if d != 0)
    )


# -- decay scoring (ES function_score decay) ----------------------------------

def test_decay_multiplier_shapes(spark):
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import decay_multiplier

    df = spark.createDataFrame(
        [(0, None), (1, 100.0), (2, 150.0), (3, 300.0)], "i long, x double"
    )
    for fn in ("gauss", "exp", "linear"):
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i",
                decay_multiplier(F.col("x"), origin=100.0, scale=100.0,
                                 decay=0.5, fn=fn).alias("m"),
            ).collect()
        }
        assert got[0] == 1.0          # NULL field -> neutral
        assert got[1] == pytest.approx(1.0)   # at origin
        # at |x-origin| == scale the multiplier is exactly `decay`
        d200 = df.where("i=3")
        # x=300: distance 200 = 2*scale
        assert got[3] < got[2] < got[1]
    # exact ES anchors at distance == scale
    anchor = spark.createDataFrame([(1, 200.0)], "i long, x double")
    for fn in ("gauss", "exp", "linear"):
        m = anchor.select(
            decay_multiplier(F.col("x"), 100.0, 100.0, decay=0.5,
                             fn=fn).alias("m")
        ).first()["m"]
        assert m == pytest.approx(0.5), fn
    # offset carves a no-decay plateau
    m = anchor.select(
        decay_multiplier(F.col("x"), 100.0, 100.0, offset=100.0,
                         decay=0.5, fn="gauss").alias("m")
    ).first()["m"]
    assert m == pytest.approx(1.0)


def test_decay_topk_matches_manual_fusion(fidx, spark):
    import math

    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import decay_topk

    idx = fidx["body"]
    fields = spark.createDataFrame(
        [(i, float((i * 37) % 500)) for i in range(30)], "doc_id long, value double"
    )
    vals = {i: float((i * 37) % 500) for i in range(30)}
    base = {r["doc_id"]: r["score"]
            for r in scored_docs(idx, "spark merge").collect()}
    sigma2 = -(100.0 * 100.0) / (2.0 * math.log(0.5))
    want = sorted(
        (
            (bid, s * math.exp(-((max(abs(vals[bid] - 50.0), 0.0)) ** 2)
                               / (2.0 * sigma2)))
            for bid, s in base.items()
        ),
        key=lambda e: (-e[1], e[0]),
    )[:5]
    got = [
        (r["doc_id"], r["score"])
        for r in decay_topk(idx, "spark merge", fields, origin=50.0,
                            scale=100.0, k=5, fn="gauss").collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1])


def test_decay_topk_promotes_from_outside_bm25_topk(fidx, spark):
    """A doc outside the BM25 top-k must win under a decay that favors
    it — proof the fusion runs over the full matched frame."""
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import decay_topk

    idx = fidx["body"]
    top = search_topk(idx, "spark merge", k=3).collect()
    top_ids = {r["doc_id"] for r in top}
    all_ids = {r["doc_id"] for r in scored_docs(idx, "spark merge").collect()}
    outsider = min(all_ids - top_ids)
    # decay field: outsider at the origin, everyone else far away
    fields = spark.createDataFrame(
        [(i, 0.0 if i == outsider else 1000.0) for i in range(30)],
        "doc_id long, value double",
    )
    got = decay_topk(idx, "spark merge", fields, origin=0.0, scale=50.0,
                     k=1, fn="gauss").first()
    assert got["doc_id"] == outsider


def test_decay_validation(fidx, spark):
    from hadoop_search_engine_spark.operators.query_exec import decay_multiplier
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        decay_multiplier(F.lit(1.0), 0.0, 100.0, decay=1.5)
    with pytest.raises(ValueError):
        decay_multiplier(F.lit(1.0), 0.0, -1.0)
    with pytest.raises(ValueError):
        decay_multiplier(F.lit(1.0), 0.0, 100.0, fn="cosine")
