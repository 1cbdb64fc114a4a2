from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.analytics import (
    count_matches,
    count_matches_dataframe,
    significant_terms,
    significant_terms_dataframe,
)

# tiny_corpus vocabulary is the synthetic Zipf wNNNNN terms (corpus.py)
QUERY = "w00000 w00010 w00200"


def _rows(df):
    return sorted(
        (r["term"], r["fg_df"], r["bg_df"], r["score"]) for r in df.collect()
    )


# ---------------------------------------------------------------- counts


@pytest.mark.parametrize("mode", ["or", "and"])
def test_count_matches_indexed_equals_exhaustive(tiny_corpus, tiny_index, mode):
    n_ix = count_matches(tiny_index, QUERY, mode=mode).collect()[0]["n_hits"]
    n_df = count_matches_dataframe(tiny_corpus, QUERY, mode=mode).collect()[0][
        "n_hits"
    ]
    assert n_ix == n_df
    assert n_ix > 0


def test_count_matches_manual_or(tiny_corpus, tiny_index):
    from hadoop_search_engine_spark.functions.tokenizer import tokens_col

    terms = QUERY.split()
    toks = tiny_corpus.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    pred = F.array_contains("toks", terms[0])
    for t in terms[1:]:
        pred = pred | F.array_contains("toks", t)
    manual = toks.where(pred).count()
    got = count_matches(tiny_index, QUERY, mode="or").collect()[0]["n_hits"]
    assert got == manual


def test_count_matches_no_hit_term_is_zero(tiny_index):
    got = count_matches(tiny_index, "zzzznotaterm", mode="or").collect()
    assert got[0]["n_hits"] == 0


def test_count_matches_masks_tombstones(spark, tiny_corpus, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import Index, matched_docs

    out = str(tmp_path / "ix")
    build_index(spark, tiny_corpus, out, num_shards=2, n_buckets=4, block_size=16)
    ix = Index.load(spark, out)
    before = count_matches(ix, QUERY).collect()[0]["n_hits"]
    victims = [r["doc_id"] for r in matched_docs(ix, QUERY).limit(3).collect()]
    delete_docs(ix, victims)
    after = count_matches(ix, QUERY).collect()[0]["n_hits"]
    assert after == before - len(victims)


# ------------------------------------------------------- significant terms


@pytest.mark.parametrize("scorer", ["jlh", "pmi"])
def test_significant_terms_indexed_equals_exhaustive(
    tiny_corpus, tiny_index, scorer
):
    ix = significant_terms(
        tiny_index, tiny_corpus, QUERY, k=15, scorer=scorer
    )
    df = significant_terms_dataframe(tiny_corpus, QUERY, k=15, scorer=scorer)
    assert _rows(ix) == _rows(df)
    assert ix.count() > 0


def test_significant_terms_planted_signal(spark, tmp_path):
    """Docs about 'zebra' always mention 'stripes'; 'stripes' is rare
    elsewhere — it must be the top significant term for query zebra."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    rows = []
    for i in range(40):
        rows.append((i, f"zebra stripes savanna doc{i % 7} grass"))
    for i in range(40, 400):
        filler = "stripes" if i % 90 == 0 else f"word{i % 13}"
        rows.append((i, f"plain {filler} grass river doc{i % 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "sig")
    build_index(spark, docs, out, num_shards=2, n_buckets=4, block_size=16)
    ix = Index.load(spark, out)

    top = significant_terms(ix, docs, "zebra", k=5).collect()
    # savanna (fg-exclusive) and stripes (40 fg + 4 bg leaks) are the
    # planted signals; both must beat every common filler term
    assert {top[0]["term"], top[1]["term"]} == {"savanna", "stripes"}
    assert all(r["fg_df"] == 40 for r in top[:2])
    # the query's own term never appears
    assert "zebra" not in {r["term"] for r in top}


def test_significant_terms_score_formula(spark, tmp_path):
    """Recompute JLH and PMI by hand for one term."""
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    rows = [(0, "apple pie"), (1, "apple pie"), (2, "apple tart"), (3, "banana pie")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "f")
    build_index(spark, docs, out, num_shards=1, n_buckets=2, block_size=16)
    ix = Index.load(spark, out)

    got = {
        r["term"]: r
        for r in significant_terms(
            ix, docs, "apple", k=10, min_fg_df=1
        ).collect()
    }
    # pie: fg 2/3 vs bg 3/4
    fg, bg = 2 / 3, 3 / 4
    assert got["pie"]["fg_df"] == 2 and got["pie"]["bg_df"] == 3
    assert got["pie"]["score"] == pytest.approx(
        round((fg - bg) * fg / bg, 6), abs=1e-9
    )
    pmi = {
        r["term"]: r
        for r in significant_terms(
            ix, docs, "apple", k=10, min_fg_df=1, scorer="pmi"
        ).collect()
    }
    assert pmi["tart"]["score"] == pytest.approx(
        round(math.log((1 / 3) / (1 / 4)), 6), abs=1e-9
    )


def test_significant_terms_min_fg_df_and_k(tiny_corpus, tiny_index):
    out = significant_terms(tiny_index, tiny_corpus, QUERY, k=3, min_fg_df=5)
    rows = out.collect()
    assert len(rows) <= 3
    assert all(r["fg_df"] >= 5 for r in rows)


def test_significant_terms_no_match_is_empty(tiny_corpus, tiny_index):
    assert (
        significant_terms(tiny_index, tiny_corpus, "zzzznotaterm").count() == 0
    )
    assert significant_terms(tiny_index, tiny_corpus, "").count() == 0


def test_significant_terms_excludes_tombstoned_from_fg(spark, tmp_path):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.index_maint import delete_docs
    from hadoop_search_engine_spark.operators.query_exec import Index

    rows = [(i, f"topic marker{i % 2} shared") for i in range(20)] + [
        (i, "filler noise") for i in range(20, 60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "t")
    build_index(spark, docs, out, num_shards=2, n_buckets=4, block_size=16)
    ix = Index.load(spark, out)
    # delete every doc containing marker1 -> fg loses them
    delete_docs(ix, [i for i in range(20) if i % 2 == 1])
    got = {
        r["term"]: r["fg_df"]
        for r in significant_terms(ix, docs, "topic", k=10, min_fg_df=1).collect()
    }
    assert "marker1" not in got
    assert got["marker0"] == 10


def test_significant_terms_rejects_bad_args(tiny_corpus, tiny_index):
    with pytest.raises(ValueError):
        significant_terms(tiny_index, tiny_corpus, QUERY, scorer="chi2")
    with pytest.raises(ValueError):
        significant_terms(tiny_index, tiny_corpus, QUERY, k=0)
    with pytest.raises(ValueError):
        significant_terms_dataframe(tiny_corpus, QUERY, k=-1)


# -- ES-style aggregations over hit sets ---------------------------------------

def _hits_fixture(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, float(v)) for i, v in
         enumerate([10, 210, 220, 850, 855, 860, 999, 50])]
        + [(8, None)],
        "doc_id long, n double",
    )
    matched = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 4, 5, 6, 8)], "doc_id long"
    )  # doc 7 (n=50) not matched
    return docs, matched


def test_histogram_facets_buckets_and_gap_fill(spark):
    from hadoop_search_engine_spark.operators.query_exec import histogram_facets

    docs, matched = _hits_fixture(spark)
    got = {
        r["bucket"]: r["n_docs"]
        for r in histogram_facets(matched, docs, "n", 100.0,
                                  min_doc_count=0).collect()
    }
    # matched values: 10,210,220,850,855,860,999 (+NULL dropped)
    # buckets 0,200,800,900 hit; 100..700 filled with 0
    assert got[0.0] == 1 and got[200.0] == 2 and got[800.0] == 3 and got[900.0] == 1
    for empty in (100.0, 300.0, 400.0, 500.0, 600.0, 700.0):
        assert got[empty] == 0
    assert len(got) == 10
    # default min_doc_count=1: no empties
    got1 = {
        r["bucket"]: r["n_docs"]
        for r in histogram_facets(matched, docs, "n", 100.0).collect()
    }
    assert got1 == {0.0: 1, 200.0: 2, 800.0: 3, 900.0: 1}
    # min_doc_count=2 prunes sparse buckets
    got2 = {
        r["bucket"]: r["n_docs"]
        for r in histogram_facets(matched, docs, "n", 100.0,
                                  min_doc_count=2).collect()
    }
    assert got2 == {200.0: 2, 800.0: 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_facets(matched, docs, "n", 0.0)


def test_range_facets_overlap_open_ends_and_empty(spark):
    from hadoop_search_engine_spark.operators.query_exec import range_facets

    docs, matched = _hits_fixture(spark)
    got = {
        (r["range_label"], r["n_docs"])
        for r in range_facets(
            matched, docs, "n",
            [("lo", None, 250), ("overlap", 200, 900), ("hi", 850, None),
             ("empty", 5000, None)],
        ).collect()
    }
    # lo: 10,210,220 = 3; overlap: 210,220,850,855,860 = 5 (999 >= 900 out)
    # hi: 850,855,860,999 = 4; to-bound exclusive, from inclusive
    assert got == {("lo", 3), ("overlap", 5), ("hi", 4), ("empty", 0)}


def test_stats_facet(spark):
    from hadoop_search_engine_spark.operators.query_exec import stats_facet

    docs, matched = _hits_fixture(spark)
    r = stats_facet(matched, docs, "n").first()
    vals = [10, 210, 220, 850, 855, 860, 999]
    assert r["n_docs"] == 7  # NULL not counted
    assert r["min"] == 10.0 and r["max"] == 999.0
    assert r["sum"] == float(sum(vals))
    assert abs(r["avg"] - sum(vals) / 7) < 1e-6


def test_percentiles_facet_exact_values(spark):
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.query_exec import (
        percentiles_facet,
    )

    docs = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50])],
        "doc_id long, n double",
    )
    matched = docs.select("doc_id")  # all docs hit
    got = {r["percent"]: r["value"]
           for r in percentiles_facet(matched, docs, "n",
                                      percents=(0.0, 25.0, 50.0,
                                                100.0)).collect()}
    # numpy-style linear interpolation over the sorted values
    assert got[0.0] == 10.0 and got[100.0] == 50.0
    assert got[50.0] == 30.0
    assert got[25.0] == 20.0
    # only matched docs count
    m2 = docs.where(F.col("doc_id") >= 3).select("doc_id")  # 40, 50
    got2 = {r["percent"]: r["value"]
            for r in percentiles_facet(m2, docs, "n",
                                       percents=(50.0,)).collect()}
    assert got2[50.0] == 45.0
    # approx path agrees on tiny inputs (accuracy >> n)
    ga = {r["percent"]: r["value"]
          for r in percentiles_facet(matched, docs, "n",
                                     percents=(50.0,),
                                     exact=False).collect()}
    assert abs(ga[50.0] - 30.0) <= 10.0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="percents"):
        percentiles_facet(matched, docs, "n", percents=())
    with _pytest.raises(ValueError, match="0, 100"):
        percentiles_facet(matched, docs, "n", percents=(101.0,))


def test_cardinality_facet_exact_and_approx(spark):
    from hadoop_search_engine_spark.operators.query_exec import (
        cardinality_facet,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(200)],
        "doc_id long, source string",
    )
    matched = docs.where("doc_id < 100").select("doc_id")
    assert cardinality_facet(
        matched, docs, "source").collect()[0]["cardinality"] == 7
    approx = cardinality_facet(
        matched, docs, "source", exact=False).collect()[0]["cardinality"]
    assert 5 <= approx <= 9


def test_top_hits_facet_per_group_ranks(spark):
    from hadoop_search_engine_spark.operators.query_exec import (
        top_hits_facet,
    )

    docs = spark.createDataFrame(
        [(i, "a" if i < 4 else "b") for i in range(8)],
        "doc_id long, source string",
    )
    # scores: tie between 1 and 2 -> id ascending breaks it
    scored = spark.createDataFrame(
        [(0, 1.0), (1, 3.0), (2, 3.0), (3, 0.5),
         (4, 9.0), (6, 2.0)],  # docs 5,7 unmatched
        "doc_id long, score double",
    )
    got = [
        (r["source"], r["hit_rank"], r["doc_id"], r["score"])
        for r in top_hits_facet(scored, docs, "source", n=2)
        .orderBy("source", "hit_rank").collect()
    ]
    assert got == [
        ("a", 1, 1, 3.0), ("a", 2, 2, 3.0),
        ("b", 1, 4, 9.0), ("b", 2, 6, 2.0),
    ]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must"):
        top_hits_facet(scored, docs, "source", n=0)


# ---------------------------------------------------------- date histogram


def test_date_histogram_calendar_months_with_gap_fill(spark):
    import datetime as dt

    from hadoop_search_engine_spark.operators.analytics import date_histogram

    rows = [
        (0, dt.datetime(2024, 1, 31, 23, 59, 59)),
        (1, dt.datetime(2024, 2, 1, 0, 0, 0)),
        (2, dt.datetime(2024, 2, 29, 12, 0, 0)),  # leap day
        (3, dt.datetime(2024, 5, 3, 4, 5, 6)),    # Mar+Apr are gaps
        (4, None),                                # nulls dropped
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r["bucket"]: r["n_docs"]
        for r in date_histogram(df, "ts", "month").collect()
    }
    assert got == {
        dt.datetime(2024, 1, 1): 1,
        dt.datetime(2024, 2, 1): 2,
        dt.datetime(2024, 5, 1): 1,
    }
    filled = {
        r["bucket"]: r["n_docs"]
        for r in date_histogram(df, "ts", "month", min_doc_count=0).collect()
    }
    # interior gaps (Mar, Apr) present with 0; span is Jan..May only
    assert filled == {
        dt.datetime(2024, 1, 1): 1,
        dt.datetime(2024, 2, 1): 2,
        dt.datetime(2024, 3, 1): 0,
        dt.datetime(2024, 4, 1): 0,
        dt.datetime(2024, 5, 1): 1,
    }
    # min_doc_count filter drops sub-threshold buckets
    thick = date_histogram(df, "ts", "month", min_doc_count=2).collect()
    assert [(r["bucket"], r["n_docs"]) for r in thick] == [
        (dt.datetime(2024, 2, 1), 2)
    ]


def test_date_histogram_week_truncates_to_monday(spark):
    import datetime as dt

    from hadoop_search_engine_spark.operators.analytics import date_histogram

    # 2024-06-05 is a Wednesday; its ISO week starts Monday 2024-06-03
    df = spark.createDataFrame(
        [(0, dt.datetime(2024, 6, 5, 10)), (1, dt.datetime(2024, 6, 9, 23))],
        "id long, ts timestamp",
    )
    got = date_histogram(df, "ts", "week").collect()
    assert [(r["bucket"], r["n_docs"]) for r in got] == [
        (dt.datetime(2024, 6, 3), 2)
    ]


def test_date_histogram_rejects_unknown_interval(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1))], "id long, ts timestamp"
    )
    from hadoop_search_engine_spark.operators.analytics import date_histogram

    with pytest.raises(ValueError, match="interval"):
        date_histogram(df, "ts", "fortnight")


def test_date_histogram_facet_over_hits(spark, tiny_corpus, tiny_index):
    """Hit-timeline facet: buckets counted over ONLY the matched docs,
    equal to a hand count from the corpus rows."""
    from collections import Counter

    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.analytics import (
        date_histogram_facet,
    )
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    # tiny_corpus drops warc_ts; rebuild with it (same deterministic gen)
    docs = assign_doc_ids(
        gen_documents(spark, 200, n_partitions=4), num_partitions=4
    ).select("doc_id", "warc_ts", "text")
    hits = matched_docs(tiny_index, QUERY)
    got = {
        r["bucket"]: r["n_docs"]
        for r in date_histogram_facet(hits, docs, "warc_ts", "hour").collect()
    }
    hit_ids = {r["doc_id"] for r in hits.collect()}
    expect = Counter(
        r["warc_ts"].replace(minute=0, second=0, microsecond=0)
        for r in docs.collect()
        if r["doc_id"] in hit_ids
    )
    assert got == dict(expect)
    assert sum(got.values()) == len(hit_ids)


def test_report_cli_timeline(spark, tmp_path, capsys):
    import json

    from hadoop_search_engine_spark.corpus import gen_documents
    from jobs.report import main as report_main

    p = str(tmp_path / "docs.parquet")
    gen_documents(spark, 300, n_partitions=4).write.parquet(p)
    report_main(["--input", p, "--timeline", "warc_ts:hour"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["report"] == "timeline" and out["interval"] == "hour"
    assert sum(b["n_docs"] for b in out["buckets"]) == 300
    # buckets are sorted and contiguous at 1h steps (min_doc_count=0)
    ts = [b["bucket"] for b in out["buckets"]]
    assert ts == sorted(ts) and len(ts) >= 2
