"""Session-9 aggregation additions: rare_terms / date_range /
multi_terms / single-value metrics / significant_terms / sampler agg
kinds in the DSL, plus the range-agg key regression (the DSL used to
pass 2-tuples into range_facets' 3-tuple unpack — any DSL range agg
crashed). The DSL adds no aggregation code of its own, so identity
with the direct operator calls (or a brute-force replay) is the
contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.analytics import (
    date_range_facet,
    multi_terms_facet,
    rare_terms_facet,
    significant_terms,
    single_metric_facet,
)
from hadoop_search_engine_spark.operators.dsl import DslError, search_dsl
from hadoop_search_engine_spark.operators.query_exec import (
    matched_docs,
    scored_docs,
)

Q = "w00000 w00017"


def _docs(tiny_corpus):
    return tiny_corpus.withColumn("n_chars", F.length("text")).withColumn(
        "bucket3", (F.col("doc_id") % 3).cast("string")
    ).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") * 3600)
    )


def _hits(tiny_index, docs):
    m = matched_docs(tiny_index, Q)
    return docs.join(m.select("doc_id"), "doc_id", "left_semi").collect()


# ------------------------------------------------------------ rare_terms


def test_rare_terms_is_the_long_tail(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    counts: dict[str, int] = {}
    for r in hits:
        k = str(r["n_chars"])
        counts[k] = counts.get(k, 0) + 1
    for mdc in (1, 2):
        want = sorted(
            ((n, k) for k, n in counts.items() if n <= mdc)
        )
        got = [
            (r["n_docs"], r["key"])
            for r in rare_terms_facet(m, docs, "n_chars",
                                      max_doc_count=mdc).collect()
        ]
        assert got == want
        assert len(got) > 0  # doc lengths vary: tail is non-empty


def test_rare_terms_skips_nulls_and_validates(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus).withColumn(
        "maybe", F.when(F.col("doc_id") % 2 == 0, F.col("lang"))
    )
    m = matched_docs(tiny_index, Q)
    got = rare_terms_facet(m, docs, "maybe", max_doc_count=10**6).collect()
    hits = _hits(tiny_index, docs)
    n_nonnull_vals = len({r["maybe"] for r in hits if r["maybe"] is not None})
    assert len(got) == n_nonnull_vals
    with pytest.raises(ValueError, match="max_doc_count"):
        rare_terms_facet(m, docs, "lang", max_doc_count=0)


# ------------------------------------------------------------ date_range


def test_date_range_counts_and_open_sides(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    cut = "1970-01-03 00:00:00"  # doc_id*3600 s => doc 48 onward
    got = {
        r["range_label"]: r["n_docs"]
        for r in date_range_facet(
            m, docs, "ts",
            [("early", None, cut), ("late", cut, None),
             ("all", None, None), ("none", "2999-01-01", None)],
        ).collect()
    }
    n_early = sum(1 for r in hits if r["doc_id"] * 3600 < 48 * 3600)
    assert got["early"] == n_early
    assert got["late"] == len(hits) - n_early
    assert got["all"] == len(hits)
    assert got["none"] == 0


def test_date_range_overlap_and_order(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    rows = date_range_facet(
        m, docs, "ts",
        [("b", "1970-01-02", None), ("a", None, None)],
    ).collect()
    # declaration order preserved; overlapping ranges counted
    # independently (sum exceeds the hit count)
    assert [r["range_label"] for r in rows] == ["b", "a"]
    assert rows[0]["n_docs"] + rows[1]["n_docs"] > rows[1]["n_docs"]
    with pytest.raises(ValueError, match="ranges"):
        date_range_facet(m, docs, "ts", [])


# ------------------------------------------------------------ multi_terms


def test_multi_terms_matches_manual_groupby(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    counts: dict[tuple, int] = {}
    for r in hits:
        counts[(r["lang"], r["bucket3"])] = counts.get(
            (r["lang"], r["bucket3"]), 0) + 1
    want = sorted(
        ((-n, k[0], k[1]) for k, n in counts.items())
    )[:5]
    got = [
        (-r["n_docs"], r["lang"], r["bucket3"])
        for r in multi_terms_facet(m, docs, ["lang", "bucket3"],
                                   size=5).collect()
    ]
    assert got == want


def test_multi_terms_skips_docs_missing_any_key(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus).withColumn(
        "bucket3", F.when(F.col("doc_id") % 3 != 0, F.col("bucket3"))
    )
    m = matched_docs(tiny_index, Q)
    total = sum(
        r["n_docs"]
        for r in multi_terms_facet(m, docs, ["lang", "bucket3"],
                                   size=10**6).collect()
    )
    hits = _hits(tiny_index, docs)
    assert total == sum(1 for r in hits if r["bucket3"] is not None)
    with pytest.raises(ValueError, match="two fields"):
        multi_terms_facet(m, docs, ["lang"])


# ------------------------------------------------------- single metrics


def test_single_metrics_match_python(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    vals = [r["n_chars"] for r in _hits(tiny_index, docs)]
    for kind, want in [
        ("avg", round(sum(vals) / len(vals), 6)),
        ("sum", float(sum(vals))),
        ("min", float(min(vals))),
        ("max", float(max(vals))),
        ("value_count", len(vals)),
    ]:
        got = single_metric_facet(m, docs, kind, "n_chars").collect()
        assert len(got) == 1
        g = got[0]["value"]
        assert math.isclose(g, want, rel_tol=0, abs_tol=1e-9), (kind, g)


def test_weighted_avg_skips_null_pairs(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus).withColumn(
        "w", F.when(F.col("doc_id") % 4 != 0,
                    (F.col("doc_id") % 7 + 1).cast("double"))
    )
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs.withColumn(
        "w", F.when(F.col("doc_id") % 4 != 0,
                    (F.col("doc_id") % 7 + 1).cast("double"))))
    num = sum(r["n_chars"] * r["w"] for r in hits if r["w"] is not None)
    den = sum(r["w"] for r in hits if r["w"] is not None)
    got = single_metric_facet(
        m, docs, "weighted_avg", "n_chars", weight_field="w"
    ).collect()[0]["value"]
    assert got == round(num / den, 6)
    with pytest.raises(ValueError, match="weight_field"):
        single_metric_facet(m, docs, "weighted_avg", "n_chars")
    with pytest.raises(ValueError, match="kind"):
        single_metric_facet(m, docs, "median", "n_chars")


# ---------------------------------------------------------- DSL wiring


def test_dsl_range_agg_no_longer_crashes_and_auto_keys(
    tiny_index, tiny_corpus
):
    """Regression: the DSL used to hand (from, to) 2-tuples to
    range_facets' (label, lo, hi) unpack — every DSL range agg raised
    ValueError. ES auto keys + explicit keys both work now."""
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"len": {"range": {
             "field": "n_chars",
             "ranges": [{"to": 200}, {"from": 200, "to": 400},
                        {"from": 400, "key": "big"}]}}}},
        documents=docs,
    )
    rows = got.aggs["len"].collect()
    assert [r["range_label"] for r in rows] == [
        "*-200.0", "200.0-400.0", "big"
    ]
    assert sum(r["n_docs"] for r in rows) == matched_docs(
        tiny_index, Q).count()


def test_dsl_new_agg_kinds_identity(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "tail": {"rare_terms": {"field": "n_chars",
                                     "max_doc_count": 2}},
             "when": {"date_range": {"field": "ts", "ranges": [
                 {"key": "early", "to": "1970-01-03 00:00:00"},
                 {"from": "1970-01-03 00:00:00"}]}},
             "pairs": {"multi_terms": {
                 "terms": [{"field": "lang"}, {"field": "bucket3"}],
                 "size": 4}},
             "mean_len": {"avg": {"field": "n_chars"}},
             "n_vals": {"value_count": {"field": "n_chars"}},
             "wavg": {"weighted_avg": {"value": {"field": "n_chars"},
                                       "weight": {"field": "n_chars"}}},
         }},
        documents=docs,
    )
    assert got.aggs["tail"].collect() == rare_terms_facet(
        m, docs, "n_chars", max_doc_count=2).collect()
    assert got.aggs["when"].collect() == date_range_facet(
        m, docs, "ts",
        [("early", None, "1970-01-03 00:00:00"),
         ("1970-01-03 00:00:00-*", "1970-01-03 00:00:00", None)],
    ).collect()
    assert got.aggs["pairs"].collect() == multi_terms_facet(
        m, docs, ["lang", "bucket3"], size=4).collect()
    assert got.aggs["mean_len"].collect() == single_metric_facet(
        m, docs, "avg", "n_chars").collect()
    assert got.aggs["n_vals"].collect() == single_metric_facet(
        m, docs, "value_count", "n_chars").collect()
    assert got.aggs["wavg"].collect() == single_metric_facet(
        m, docs, "weighted_avg", "n_chars",
        weight_field="n_chars").collect()


def test_dsl_significant_terms_matches_direct_call(
    tiny_index, tiny_corpus
):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"sig": {"significant_terms": {"size": 10}}}},
        documents=docs,
    )
    want = significant_terms(tiny_index, docs, Q, k=10, fg=m)
    assert got.aggs["sig"].collect() == want.collect()
    # the fg= path must equal the classic path when fg IS the query's
    # own matched set
    classic = significant_terms(tiny_index, docs, Q, k=10)
    assert want.collect() == classic.collect()


def test_dsl_sampler_restricts_sub_aggs_to_top_hits(
    tiny_index, tiny_corpus
):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"top": {"sampler": {"shard_size": 5},
                          "aggs": {"langs": {"terms":
                                             {"field": "lang"}}}}}},
        documents=docs,
    )
    rows = got.aggs["top.langs"].collect()
    assert sum(r["n_docs"] for r in rows) == 5
    # replay: the sample is the 5 best (score desc, doc_id asc) hits
    sc = scored_docs(tiny_index, Q)
    top5 = [
        r["doc_id"]
        for r in sc.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(5).collect()
    ]
    want = (
        docs.where(F.col("doc_id").isin(top5))
        .groupBy("lang").count().collect()
    )
    assert {(r["lang"], r["n_docs"]) for r in rows} == {
        (r["lang"], r["count"]) for r in want
    }


def test_dsl_sampler_needs_subaggs_and_scores(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    with pytest.raises(DslError, match="sub-aggs"):
        search_dsl(
            tiny_index,
            {"query": {"match": {"text": Q}},
             "aggs": {"s": {"sampler": {"shard_size": 5}}}},
            documents=docs,
        )
    with pytest.raises(DslError, match="scoring"):
        search_dsl(
            tiny_index,
            {"query": {"constant_score": {"filter":
                                          {"match": {"text": Q}}}},
             "aggs": {"s": {"sampler": {"shard_size": 5},
                            "aggs": {"langs": {"terms":
                                               {"field": "lang"}}}}}},
            documents=docs,
        )


# ------------------------------------------- terms order / top_metrics


def test_terms_order_by_metric_and_size(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        terms_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    full = terms_metrics_facet(
        m, docs, "lang", {"avg_len": ("avg", "n_chars")}
    ).collect()
    want = sorted(full, key=lambda r: (r["avg_len"], r["lang"]))
    got = terms_metrics_facet(
        m, docs, "lang", {"avg_len": ("avg", "n_chars")},
        order=("avg_len", True), size=2,
    ).collect()
    assert got == want[:2]
    # _key ordering, no size
    got_k = terms_metrics_facet(
        m, docs, "lang", {"avg_len": ("avg", "n_chars")},
        order=("_key", True),
    ).collect()
    assert got_k == sorted(full, key=lambda r: r["lang"])
    with pytest.raises(ValueError, match="order key"):
        terms_metrics_facet(
            m, docs, "lang", {"avg_len": ("avg", "n_chars")},
            order=("nope", True),
        ).collect()


def test_dsl_terms_order_identity(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        terms_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"langs": {
             "terms": {"field": "lang", "size": 2,
                       "order": {"avg_len": "desc"}},
             "aggs": {"avg_len": {"avg": {"field": "n_chars"}}}}}},
        documents=docs,
    )
    m = matched_docs(tiny_index, Q)
    want = terms_metrics_facet(
        m, docs, "lang", {"avg_len": ("avg", "n_chars")},
        order=("avg_len", False), size=2,
    )
    assert got.aggs["langs"].collect() == want.collect()


def test_top_metrics_takes_from_best_sorted_doc(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        top_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    best = sorted(hits, key=lambda r: (-r["n_chars"], r["doc_id"]))[:3]
    got = top_metrics_facet(m, docs, ["lang", "doc_id"], "n_chars",
                            size=3).collect()
    assert [(r["sort_value"], r["lang"], r["doc_id"]) for r in got] == [
        (r["n_chars"], r["lang"], r["doc_id"]) for r in best
    ]
    worst = min(r["n_chars"] for r in hits)
    got_a = top_metrics_facet(m, docs, ["lang"], "n_chars",
                              ascending=True).collect()
    assert got_a[0]["sort_value"] == worst


def test_dsl_top_metrics_and_significant_text(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        significant_terms,
        top_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "newest": {"top_metrics": {
                 "metrics": {"field": "lang"},
                 "sort": {"n_chars": "desc"}, "size": 2}},
             "sig": {"significant_text": {"size": 5}},
         }},
        documents=docs,
    )
    assert got.aggs["newest"].collect() == top_metrics_facet(
        m, docs, ["lang"], "n_chars", size=2).collect()
    assert got.aggs["sig"].collect() == significant_terms(
        tiny_index, docs, Q, k=5, fg=m).collect()


# ------------------------------------------------------- knn filter


def test_dsl_knn_filter_restricts_candidates(spark, tiny_index,
                                             tiny_corpus):
    import numpy as np

    from hadoop_search_engine_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(7)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)])
         for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    docs = _docs(tiny_corpus)
    qv = [1.0, 0.0, -1.0, 0.5, 0.0, 0.0, 2.0, -0.5]
    got = search_dsl(
        tiny_index,
        {"knn": {"field": "embedding", "query_vector": qv, "k": 5,
                 "filter": {"term": {"lang": "en"}}}},
        embeddings=emb, documents=docs,
    )
    allowed = {r["doc_id"]
               for r in docs.where(F.col("lang") == "en").collect()}
    restricted = emb.where(F.col("vec_id").isin(list(allowed)))
    want = cosine_topk(restricted, qv, k=5)
    assert [tuple(r) for r in got.hits.collect()] == [
        tuple(r) for r in want.collect()]
    assert all(r["vec_id"] in allowed for r in got.hits.collect())
    with pytest.raises(DslError, match="documents"):
        search_dsl(
            tiny_index,
            {"knn": {"field": "embedding", "query_vector": qv, "k": 5,
                     "filter": {"term": {"lang": "en"}}}},
            embeddings=emb,
        )


# ------------------------------------------------------- pipeline aggs


def test_histogram_metrics_matches_manual(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        histogram_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    byb: dict[float, list] = {}
    for r in hits:
        b = (r["n_chars"] // 500) * 500.0
        byb.setdefault(b, []).append(r["n_chars"])
    got = histogram_metrics_facet(
        m, docs, "n_chars", 500.0, {"avg_len": ("avg", "n_chars")}
    ).collect()
    assert [r["bucket"] for r in got] == sorted(byb)
    for r in got:
        vals = byb[r["bucket"]]
        assert r["n_docs"] == len(vals)
        assert r["avg_len"] == round(sum(vals) / len(vals), 6)


def test_pipeline_cols_on_known_frame(spark):
    from hadoop_search_engine_spark.operators.analytics import (
        cumulative_sum_col,
        derivative_col,
        moving_avg_col,
        sibling_bucket_stat,
    )

    rows = [(1.0, 10.0), (2.0, 30.0), (3.0, 20.0), (4.0, 30.0)]
    b = spark.createDataFrame(rows, "bucket double, v double")
    d = {r["bucket"]: r["v_deriv"]
         for r in derivative_col(b, "v").collect()}
    assert d == {1.0: None, 2.0: 20.0, 3.0: -10.0, 4.0: 10.0}
    c = {r["bucket"]: r["v_cumsum"]
         for r in cumulative_sum_col(b, "v").collect()}
    assert c == {1.0: 10.0, 2.0: 40.0, 3.0: 60.0, 4.0: 90.0}
    # moving avg over the PREVIOUS 2 buckets, current excluded
    ma = {r["bucket"]: r["v_mavg"]
          for r in moving_avg_col(b, "v", 2).collect()}
    assert ma == {1.0: None, 2.0: 10.0, 3.0: 20.0, 4.0: 25.0}
    # sibling stats; max has a TIE (30 at buckets 2 and 4)
    mx = sibling_bucket_stat(b, "v", "max_bucket").collect()[0]
    assert mx["value"] == 30.0 and mx["keys"] == "2.0,4.0"
    mn = sibling_bucket_stat(b, "v", "min_bucket").collect()[0]
    assert mn["value"] == 10.0 and mn["keys"] == "1.0"
    assert sibling_bucket_stat(b, "v", "avg_bucket").collect()[0][
        "value"] == 22.5
    assert sibling_bucket_stat(b, "v", "sum_bucket").collect()[0][
        "value"] == 90.0
    with pytest.raises(ValueError, match="kind"):
        sibling_bucket_stat(b, "v", "median_bucket")


def test_dsl_histogram_pipeline_aggs(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        cumulative_sum_col,
        derivative_col,
        histogram_metrics_facet,
        sibling_bucket_stat,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "per_len": {
                 "histogram": {"field": "n_chars", "interval": 500},
                 "aggs": {
                     "total": {"sum": {"field": "n_chars"}},
                     "cum": {"cumulative_sum": {"buckets_path":
                                                "total"}},
                     "growth": {"derivative": {"buckets_path":
                                               "_count"}},
                 }},
             "best": {"max_bucket": {"buckets_path":
                                     "per_len>total"}},
         }},
        documents=docs,
    )
    want = histogram_metrics_facet(
        m, docs, "n_chars", 500.0, {"total": ("sum", "n_chars")})
    want = cumulative_sum_col(want, "total", out_col="cum")
    want = derivative_col(want, "n_docs", out_col="growth")
    assert got.aggs["per_len"].collect() == want.collect()
    assert got.aggs["best"].collect() == sibling_bucket_stat(
        want, "total", "max_bucket").collect()


def test_dsl_date_histogram_subs_and_errors(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        date_histogram_metrics_facet,
        moving_avg_col,
    )

    docs = _docs(tiny_corpus)   # ts = doc_id * 3600 s => hourly spread
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"daily": {
             "date_histogram": {"field": "ts",
                                "calendar_interval": "day"},
             "aggs": {"avg_len": {"avg": {"field": "n_chars"}},
                      "trend": {"moving_fn": {
                          "buckets_path": "avg_len", "window": 2}}}}}},
        documents=docs,
    )
    want = date_histogram_metrics_facet(
        m, docs, "ts", "day", {"avg_len": ("avg", "n_chars")})
    want = moving_avg_col(want, "avg_len", 2, out_col="trend")
    assert got.aggs["daily"].collect() == want.collect()
    with pytest.raises(DslError, match="buckets_path"):
        search_dsl(
            tiny_index,
            {"query": {"match": {"text": Q}},
             "aggs": {"h": {
                 "histogram": {"field": "n_chars", "interval": 500},
                 "aggs": {"d": {"derivative":
                                {"buckets_path": "nope"}}}}}},
            documents=docs,
        )
    with pytest.raises(DslError, match="parent"):
        search_dsl(
            tiny_index,
            {"query": {"match": {"text": Q}},
             "aggs": {"best": {"max_bucket":
                               {"buckets_path": "zzz>total"}}}},
            documents=docs,
        )


def test_serial_diff_stats_percentiles_bucket(spark):
    from hadoop_search_engine_spark.operators.analytics import (
        percentiles_bucket,
        serial_diff_col,
        stats_bucket,
    )

    rows = [(float(i), float(v)) for i, v in
            enumerate([10, 30, 20, 30, 50, 40])]
    b = spark.createDataFrame(rows, "bucket double, v double")
    s2 = {r["bucket"]: r["v_sdiff"]
          for r in serial_diff_col(b, "v", lag=2).collect()}
    assert s2 == {0.0: None, 1.0: None, 2.0: 10.0, 3.0: 0.0,
                  4.0: 30.0, 5.0: 10.0}
    with pytest.raises(ValueError, match="lag"):
        serial_diff_col(b, "v", lag=0)
    st = stats_bucket(b, "v").collect()[0]
    assert (st["n_buckets"], st["min"], st["max"], st["sum"]) == (
        6, 10.0, 50.0, 180.0)
    assert st["avg"] == 30.0
    ps = {r["percent"]: r["value"]
          for r in percentiles_bucket(b, "v", (0.0, 50.0, 100.0)).collect()}
    assert ps[0.0] == 10.0 and ps[100.0] == 50.0 and ps[50.0] == 30.0


def test_dsl_serial_diff_and_sibling_stats(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        histogram_metrics_facet,
        percentiles_bucket,
        serial_diff_col,
        stats_bucket,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {
             "per_len": {
                 "histogram": {"field": "n_chars", "interval": 500},
                 "aggs": {"sd": {"serial_diff":
                                 {"buckets_path": "_count",
                                  "lag": 2}}}},
             "spread": {"stats_bucket":
                        {"buckets_path": "per_len>_count"}},
             "pct": {"percentiles_bucket":
                     {"buckets_path": "per_len>_count",
                      "percents": [50.0, 90.0]}},
         }},
        documents=docs,
    )
    want = histogram_metrics_facet(m, docs, "n_chars", 500.0, {})
    want = serial_diff_col(want, "n_docs", lag=2, out_col="sd")
    assert got.aggs["per_len"].collect() == want.collect()
    assert got.aggs["spread"].collect() == stats_bucket(
        want, "n_docs").collect()
    assert got.aggs["pct"].collect() == percentiles_bucket(
        want, "n_docs", (50.0, 90.0)).collect()


# ------------------------------------------- terms include/exclude/missing


def test_terms_include_exclude_missing(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import facet_counts

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    full = {r["lang"]: r["n_docs"]
            for r in facet_counts(m, docs, ["lang"]).collect()}
    langs = sorted(full)
    # include list
    got = {r["lang"]: r["n_docs"]
           for r in facet_counts(m, docs, ["lang"],
                                 include=langs[:2]).collect()}
    assert got == {k: full[k] for k in langs[:2]}
    # exclude regex is whole-key anchored (ES): 'e.' matches 'en'/'es'
    got = {r["lang"]: r["n_docs"]
           for r in facet_counts(m, docs, ["lang"],
                                 exclude="e.").collect()}
    assert got == {k: v for k, v in full.items()
                   if not (len(k) == 2 and k.startswith("e"))}
    # missing replaces nulls with the sentinel
    docs_n = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 5 != 0, F.col("lang")))
    got = {r["lang"]: r["n_docs"]
           for r in facet_counts(m, docs_n, ["lang"],
                                 missing="(none)").collect()}
    assert "(none)" in got and None not in got
    assert sum(got.values()) == sum(full.values())
    with pytest.raises(ValueError, match="single-facet"):
        facet_counts(m, docs, ["lang", "url"], include=["en"])


def test_dsl_terms_include_exclude_identity(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import facet_counts

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"langs": {"terms": {"field": "lang",
                                      "include": "e.|und",
                                      "exclude": ["es"],
                                      "size": 5}}}},
        documents=docs,
    )
    want = facet_counts(m, docs, ["lang"], size=5,
                        include="e.|und", exclude=["es"])
    assert got.aggs["langs"].collect() == want.collect()


# -------------------------------------- bucket_script / bucket_selector


def test_bucket_script_and_selector_on_known_frame(spark):
    from hadoop_search_engine_spark.operators.analytics import (
        bucket_script_col,
        bucket_selector,
    )

    rows = [(1.0, 4, 100.0), (2.0, 2, 30.0), (3.0, 5, 0.0)]
    b = spark.createDataFrame(rows, "bucket double, n_docs long, v double")
    got = {r["bucket"]: r["ratio"]
           for r in bucket_script_col(
               b, {"t": "v", "n": "_count"},
               "params.t / params.n", "ratio").collect()}
    assert got == {1.0: 25.0, 2.0: 15.0, 3.0: 0.0}
    kept = sorted(
        r["bucket"]
        for r in bucket_selector(
            b, {"t": "v", "n": "_count"},
            "params.t > 10 and params.n >= 2").collect()
    )
    assert kept == [1.0, 2.0]
    # arithmetic beyond the subset is rejected loudly
    for bad in ("__import__('os')", "params.t ** 2", "open('x')",
                "params.nope + 1", "x + 1"):
        with pytest.raises(ValueError):
            bucket_script_col(b, {"t": "v"}, bad, "y").collect()


def test_dsl_bucket_script_selector_chain(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        bucket_script_col,
        bucket_selector,
        histogram_metrics_facet,
    )

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"h": {
             "histogram": {"field": "n_chars", "interval": 500},
             "aggs": {
                 "total": {"sum": {"field": "n_chars"}},
                 "mean": {"bucket_script": {
                     "buckets_path": {"t": "total", "n": "_count"},
                     "script": "params.t / params.n"}},
                 "big": {"bucket_selector": {
                     "buckets_path": {"n": "_count"},
                     "script": "params.n >= 2"}},
             }}}},
        documents=docs,
    )
    want = histogram_metrics_facet(m, docs, "n_chars", 500.0,
                                   {"total": ("sum", "n_chars")})
    want = bucket_script_col(want, {"t": "total", "n": "_count"},
                             "params.t / params.n", "mean")
    want = bucket_selector(want, {"n": "_count"}, "params.n >= 2")
    assert got.aggs["h"].collect() == want.collect()
    with pytest.raises(DslError, match="map"):
        search_dsl(
            tiny_index,
            {"query": {"match": {"text": Q}},
             "aggs": {"h": {
                 "histogram": {"field": "n_chars", "interval": 500},
                 "aggs": {"s": {"bucket_script": {
                     "buckets_path": "_count",
                     "script": "params.n"}}}}}},
            documents=docs,
        )


# --------------------------- auto_date_histogram / diversified_sampler


def test_auto_date_histogram_picks_interval(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.analytics import (
        auto_date_histogram_facet,
    )

    docs = _docs(tiny_corpus)   # ts = doc_id hours over ~200 docs
    m = matched_docs(tiny_index, Q)
    hits = _hits(tiny_index, docs)
    span_s = (max(r["doc_id"] for r in hits)
              - min(r["doc_id"] for r in hits)) * 3600
    rows = auto_date_histogram_facet(m, docs, "ts", buckets=10).collect()
    assert rows
    iv = rows[0]["interval"]
    assert all(r["interval"] == iv for r in rows)
    assert len(rows) <= 10
    # ~200 hourly points => day-or-coarser at 10 buckets
    assert iv in ("day", "week", "month")
    assert sum(r["n_docs"] for r in rows) == len(hits)
    # generous budget => finer interval, more buckets
    fine = auto_date_histogram_facet(m, docs, "ts",
                                     buckets=10**6).collect()
    assert fine[0]["interval"] == "minute"
    with pytest.raises(ValueError, match="buckets"):
        auto_date_histogram_facet(m, docs, "ts", buckets=0)


def test_dsl_diversified_sampler_caps_per_value(tiny_index, tiny_corpus):
    docs = _docs(tiny_corpus)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"div": {
             "diversified_sampler": {"shard_size": 6, "field": "lang",
                                     "max_docs_per_value": 2},
             "aggs": {"langs": {"terms": {"field": "lang"}}}}}},
        documents=docs,
    )
    rows = got.aggs["div.langs"].collect()
    assert sum(r["n_docs"] for r in rows) == 6
    assert all(r["n_docs"] <= 2 for r in rows)  # the de-bias cap
    # plain sampler at the same size is head-heavy by comparison
    plain = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"top": {"sampler": {"shard_size": 6},
                          "aggs": {"langs": {"terms":
                                             {"field": "lang"}}}}}},
        documents=docs,
    ).aggs["top.langs"].collect()
    assert max(r["n_docs"] for r in plain) >= max(
        r["n_docs"] for r in rows)


def test_dsl_min_score_and_explain(tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.query_exec import (
        explain_score,
        search_topk,
    )

    full = search_topk(tiny_index, Q, k=10).collect()
    cut = full[4]["score"]
    r = search_dsl(tiny_index,
                   {"query": {"match": {"text": Q}}, "size": 10,
                    "min_score": cut})
    got = r.hits.collect()
    assert all(x["score"] >= cut for x in got)
    assert [x["doc_id"] for x in got] == [
        x["doc_id"] for x in full if x["score"] >= cut]
    # explain: per-hit breakdown sums to the hit score
    r2 = search_dsl(tiny_index,
                    {"query": {"match": {"text": Q}}, "size": 3,
                     "explain": True})
    page = {x["doc_id"]: x["score"] for x in r2.hits.collect()}
    exp = r2.explain.collect()
    assert {x["doc_id"] for x in exp} == set(page)
    for d, s in page.items():
        parts = [x["contribution"] for x in exp if x["doc_id"] == d]
        direct = explain_score(tiny_index, Q, d).collect()
        assert sorted(parts) == sorted(
            x["contribution"] for x in direct)
        assert abs(sum(parts) - s) < 1e-6


# ---------------------------------- significant_terms background_filter


def test_significant_terms_background_filter(tiny_index, tiny_corpus):
    import math as _m

    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    bg = docs.where(F.col("lang") == "en").select("doc_id")
    got = significant_terms(tiny_index, docs, Q, k=10, fg=m,
                            background=bg).collect()
    assert got
    # replay one row's JLH arithmetic against python counts
    from hadoop_search_engine_spark.functions.tokenizer import tokenize

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    fg_ids = {r["doc_id"] for r in m.collect()}
    bg_ids = {r["doc_id"] for r in bg.collect()}
    for row in got[:3]:
        t = row["term"]
        fg_df = sum(1 for d in fg_ids if t in tokenize(texts[d]))
        bg_df = sum(1 for d in bg_ids if t in tokenize(texts[d]))
        assert (row["fg_df"], row["bg_df"]) == (fg_df, bg_df)
        fp, bp = fg_df / len(fg_ids), bg_df / len(bg_ids)
        want = round((fp - bp) * (fp / bp), 6)
        assert _m.isclose(row["score"], want, abs_tol=1e-6)
    # terms absent from the background subset drop out
    all_bg_terms = {
        t for d in bg_ids for t in tokenize(texts[d])
    }
    assert all(r["term"] in all_bg_terms for r in got)


def test_dsl_significant_terms_background_filter_identity(
    tiny_index, tiny_corpus
):
    docs = _docs(tiny_corpus)
    m = matched_docs(tiny_index, Q)
    got = search_dsl(
        tiny_index,
        {"query": {"match": {"text": Q}},
         "aggs": {"sig": {"significant_terms": {
             "size": 8,
             "background_filter": {"term": {"lang": "en"}}}}}},
        documents=docs,
    )
    bg = docs.where(F.col("lang") == "en").select("doc_id")
    want = significant_terms(tiny_index, docs, Q, k=8, fg=m,
                             background=bg)
    assert got.aggs["sig"].collect() == want.collect()
