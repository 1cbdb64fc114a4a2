"""Time-partitioned indexes (ES data-stream / ILM): routing, range
search parity with brute force and with plain federated search,
boundary masks, rollover append-only, retention."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.bm25 import idf as _idf
from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.index_maint import delete_docs
from hadoop_search_engine_spark.operators.query_exec import (
    search_topk_segments,
)
from hadoop_search_engine_spark.operators.time_partitioned import (
    TimePartitionedIndex,
    build_time_partitioned_index,
    drop_periods,
    rollover_append,
    route_time_range,
    search_time_range,
)

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z
DAY_US = 86400 * 1_000_000
QUERY = "w00000 w00017"
K1, B = 1.2, 0.75


def _us(day: int) -> int:
    return EPOCH_2026 * 1_000_000 + day * DAY_US


def _with_ts(docs):
    # 2026-01-01 + (doc_id % 120) days -> four calendar months
    return docs.withColumn(
        "warc_ts",
        F.timestamp_seconds(F.lit(EPOCH_2026) + (F.col("doc_id") % 120) * 86400),
    )


@pytest.fixture(scope="module")
def tpi(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tpi") / "idx")
    docs = _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts")
    return build_time_partitioned_index(spark, docs, out, interval="month",
                                        num_shards=2, n_buckets=4,
                                        block_size=16)


@pytest.fixture(scope="module")
def corpus_rows(tiny_corpus):
    return [(int(r["doc_id"]), r["text"]) for r in
            tiny_corpus.select("doc_id", "text").collect()]


def _bruteforce(rows, terms, lo_us, hi_us, k):
    """Global stats over the periods overlapping the range (month
    granularity), eligibility = ts strictly in range."""
    def day(d):
        return d % 120

    def ts(d):
        return _us(day(d))

    # month bucket of a day offset in Jan..Apr 2026
    month_start = {0: 0, 1: 31, 2: 59, 3: 90, 4: 120}

    def month(d):
        dd = day(d)
        return max(m for m, s in month_start.items() if s <= dd)

    in_range = {d for d, _ in rows if lo_us <= ts(d) < hi_us}
    sel_months = {month(d) for d in in_range}
    selected = [(d, t) for d, t in rows if month(d) in sel_months]
    postings, dls = {}, {}
    for d, t in selected:
        toks = tokenize(t)
        if not toks:
            continue
        dls[d] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[d] = tf
    n = len(dls)
    avg = sum(dls.values()) / n
    sc = {}
    for t in sorted(set(terms)):
        pl = postings.get(t, {})
        if not pl:
            continue
        w = _idf(n, len(pl))
        for d, tf in pl.items():
            sc[d] = sc.get(d, 0.0) + w * (tf * (K1 + 1)) / (
                tf + K1 * (1 - B + B * dls[d] / avg)
            )
    elig = [(d, s) for d, s in sc.items() if d in in_range]
    elig.sort(key=lambda kv: (-kv[1], kv[0]))
    return elig[:k]


def _triples(df):
    return [(r["period"], r["doc_id"], r["score"]) for r in df.collect()]


LO, HI = _us(14), _us(68)  # 2026-01-15 .. 2026-03-10


def test_routing(tpi):
    r = route_time_range(tpi, LO, HI)
    assert r["interior"] == ["2026-02"]
    assert r["boundary"] == ["2026-01", "2026-03"]
    assert r["pruned"] == ["2026-04"]


def test_range_search_matches_bruteforce_both_servings(tpi, corpus_rows):
    ref = _bruteforce(corpus_rows, QUERY.split(), LO, HI, 10)
    drv = _triples(search_time_range(tpi, QUERY, LO, HI, k=10,
                                     serving="driver"))
    spk = _triples(search_time_range(tpi, QUERY, LO, HI, k=10,
                                     serving="spark"))
    got = [(d, s) for _, d, s in drv]
    assert len(got) == len(ref) and all(
        a[0] == b[0] and abs(a[1] - b[1]) < 1e-9 for a, b in zip(got, ref)
    )
    assert got == [(d, s) for _, d, s in spk]
    # the period column is the doc's actual month
    for p, d, _ in drv:
        assert p in ("2026-01", "2026-02", "2026-03")


def test_range_boundaries_inclusive_exclusive(tpi, corpus_rows):
    lo, hi = _us(31), _us(59)  # exactly February
    got = _triples(search_time_range(tpi, QUERY, lo, hi, k=200,
                                     serving="driver"))
    days = {d % 120 for _, d, _ in got}
    assert days and all(31 <= dd < 59 for dd in days)


def test_full_span_equals_federated(tpi):
    got = _triples(search_time_range(tpi, QUERY, _us(0), _us(120), k=10))
    idxs = [tpi.index(p["name"]) for p in tpi.periods]
    fed = [(r["doc_id"], r["score"]) for r in
           search_topk_segments(idxs, QUERY, k=10).collect()]
    assert [(d, s) for _, d, s in got] == fed


def test_empty_route_is_empty(tpi):
    assert search_time_range(tpi, QUERY, _us(400), _us(500), k=5).count() == 0
    assert _triples(search_time_range(tpi, "zzznope", LO, HI, k=5)) == []


def test_tombstones_compose(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "tpi_tomb")
    docs = _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts")
    t = build_time_partitioned_index(spark, docs, out, interval="month",
                                     num_shards=2, n_buckets=4)
    before = _triples(search_time_range(t, QUERY, LO, HI, k=5))
    period, victim, _ = before[0]
    delete_docs(t.index(period), [victim])
    t2 = TimePartitionedIndex.load(spark, out)
    after = _triples(search_time_range(t2, QUERY, LO, HI, k=5))
    assert all(d != victim for _, d, _ in after)


def test_rollover_appends_and_refuses_duplicates(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "tpi_roll")
    docs = _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts")
    t = build_time_partitioned_index(spark, docs, out, interval="month",
                                     num_shards=2, n_buckets=4)
    new = tiny_corpus.limit(20).withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(EPOCH_2026 + 130 * 86400))
    ).select("doc_id", "text", "warc_ts")
    t2 = rollover_append(t, new)
    assert [p["name"] for p in t2.periods][-1] == "2026-05"
    got = _triples(search_time_range(t2, QUERY, _us(120), _us(150), k=5))
    assert all(p == "2026-05" for p, _, _ in got)
    with pytest.raises(ValueError, match="append-only"):
        rollover_append(t2, new)


def test_retention_drops_manifest_first(spark, tiny_corpus, tmp_path):
    import os

    out = str(tmp_path / "tpi_ret")
    docs = _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts")
    t = build_time_partitioned_index(spark, docs, out, interval="month",
                                     num_shards=2, n_buckets=4)
    t2 = drop_periods(t, _us(31))
    assert [p["name"] for p in t2.periods] == ["2026-02", "2026-03", "2026-04"]
    assert not os.path.exists(os.path.join(out, "periods", "2026-01"))
    # surviving periods still serve
    assert _triples(search_time_range(t2, QUERY, _us(31), _us(120), k=5))
    with pytest.raises(ValueError, match="every period"):
        drop_periods(t2, _us(1000))


def test_bad_args(tpi, spark, tiny_corpus, tmp_path):
    with pytest.raises(ValueError, match="lo_us < hi_us"):
        search_time_range(tpi, QUERY, _us(10), _us(10))
    with pytest.raises(ValueError, match="serving"):
        search_time_range(tpi, QUERY, LO, HI, serving="edge")
    with pytest.raises(ValueError, match="interval"):
        build_time_partitioned_index(
            spark, _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts"),
            str(tmp_path / "x"), interval="fortnight")


def test_concurrent_builds_identical(spark, tiny_corpus, tmp_path):
    """concurrency > 1 overlaps the per-period Spark jobs; the
    resulting indexes must serve rank/score-identically to the
    sequential build (each build is its own deterministic job tree)."""
    docs = _with_ts(tiny_corpus).select("doc_id", "text", "warc_ts")
    seq = build_time_partitioned_index(
        spark, docs, str(tmp_path / "seq"), interval="month",
        num_shards=2, n_buckets=4)
    par = build_time_partitioned_index(
        spark, docs, str(tmp_path / "par"), interval="month",
        num_shards=2, n_buckets=4, concurrency=4)
    assert [p["name"] for p in par.periods] == [p["name"] for p in seq.periods]
    a = _triples(search_time_range(seq, QUERY, LO, HI, k=20))
    b = _triples(search_time_range(par, QUERY, LO, HI, k=20))
    assert a == b and a
