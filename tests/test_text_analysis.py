"""Text-analysis operators: token count, lang id, quality, fingerprint."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.operators.text_analysis import (
    analyze,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The cat and the dog, in the house."),
        (1, "el perro y la casa de la familia"),
        (2, "w00001 w00002 w00003"),
        (3, ""),
        (4, None),
        # long doc: fingerprint fold must survive hundreds of tokens
        # without int64 overflow under ANSI mode (regression: the fold
        # peak is acc*31 + h < 2^61 + 2^56)
        (5, " ".join(f"tok{i}" for i in range(500))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark, docs):
    out = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 8
    assert out[2] == 3
    assert out[3] == 0
    assert out[5] == 500


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in
           docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"
    assert out[3] == "und"


def test_quality_bounds(spark, docs):
    vals = [
        r["q"]
        for r in docs.where(F.col("text").isNotNull())
        .select(quality_score(F.col("text")).alias("q"))
        .collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_fingerprint_no_overflow_and_order_sensitive(spark, docs):
    # ANSI mode (Spark 4 default) raises on long overflow — the long
    # doc row is the regression probe.
    out = {r["doc_id"]: r["fp"] for r in
           docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[5] is not None and out[5] >= 0
    # order sensitivity
    pair = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in pair.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]
    # determinism across evaluations
    again = {r["doc_id"]: r["fp"] for r in
             docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert out == again


def test_bpe_ish_monotone(spark):
    df = spark.createDataFrame(
        [(0, "hi"), (1, "internationalization")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 1
    assert out[1] == 5  # ceil(20/4)


def test_analyze_bundle(spark, docs):
    out = analyze(docs)
    assert set(out.columns) == {
        "doc_id", "n_tokens", "n_subwords", "lang_pred", "quality", "fingerprint"
    }
    assert out.count() == docs.count()


def test_blob_chunks_reassemble_byte_identical(spark):
    """Chunked byte-range reads (HTTP 206 analog) cover the blob exactly
    and concatenate back to the original bytes."""
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.multimodal import (
        blob_chunks,
        blob_range,
    )

    payloads = [b"a" * 25, b"hello world " * 3, b"x", b""]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "url int, html binary"
    )
    rows = blob_chunks(df, chunk_size=10).orderBy("url", "chunk_id").collect()
    by_url: dict[int, bytes] = {}
    for r in rows:
        by_url[r["url"]] = by_url.get(r["url"], b"") + bytes(r["chunk"] or b"")
        assert r["chunk_len"] <= 10
        assert r["total_len"] == len(payloads[r["url"]])
    assert by_url == {i: p for i, p in enumerate(payloads)}

    # single-range semantics: past-end reads are empty, like HTTP 206
    rng = {r["url"]: bytes(r["chunk"] or b"")
           for r in blob_range(df, offset=20, length=10).collect()}
    assert rng[0] == b"a" * 5
    assert rng[3] == b""


def test_tfidf_top_terms_matches_python(spark):
    from collections import Counter

    from hadoop_search_engine_spark.functions.bm25 import idf as idf_fn
    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    rows = [
        (0, "spark spark query merge table"),
        (1, "merge merge merge rare spark"),
        (2, "query table table fast"),
        (3, "unique words appear here once"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["weight"])
        for r in tfidf_top_terms(docs, n=2).collect()
    }
    # pure-python recompute
    toks = {i: tokenize(t) for i, t in rows}
    df = Counter()
    for i, ts in toks.items():
        for t in set(ts):
            df[t] += 1
    n = len(rows)
    for i, ts in toks.items():
        tf = Counter(ts)
        want = sorted(
            ((t, c, round(c * idf_fn(n, df[t]), 6)) for t, c in tf.items()),
            key=lambda e: (-e[2], e[0]),
        )[:2]
        for rank, (t, c, w) in enumerate(want, start=1):
            g = got[(i, rank)]
            assert g == (t, c, pytest.approx(w, abs=1e-9)), (i, rank, g, (t, c, w))
    # every doc contributes exactly min(2, n_distinct) rows
    assert len(got) == sum(min(2, len(set(ts))) for ts in toks.values())


def test_tfidf_top_terms_partition_invariant(spark):
    from hadoop_search_engine_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    rows = [(i, f"w{i % 7} w{i % 3} common common") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, tfidf_top_terms(docs, n=3).collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs.repartition(11), n=3).collect()))
    assert a == b


def test_redact_pii_all_kinds_and_order(spark):
    from hadoop_search_engine_spark.operators.text_analysis import (
        pii_counts,
        redact_pii,
    )

    docs = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@sub.example.org thanks"),
            (1, "server at 192.168.10.254 port 80, also 8.8.8.8"),
            (2, "call +44 (0)20 7946-0958 today"),
            (3, "nothing sensitive 1.2 here v1.2.3 nope"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert got[0] == "mail me at <EMAIL> thanks"
    assert got[1] == "server at <IP> port 80, also <IP>"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "nothing sensitive 1.2 here v1.2.3 nope"

    row = pii_counts(docs).collect()[0]
    assert row["n_docs"] == 4
    assert row["email_matches"] == 1 and row["email_docs"] == 1
    assert row["ipv4_matches"] == 2 and row["ipv4_docs"] == 1
    assert row["phone_matches"] == 1 and row["phone_docs"] == 1

    # selecting a subset leaves other kinds intact
    only_ip = {r["doc_id"]: r["text"]
               for r in redact_pii(docs, kinds=("ipv4",)).collect()}
    assert "jane.doe" in only_ip[0] and "<IP>" in only_ip[1]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown PII"):
        redact_pii(docs, kinds=("ssn",))
    with _pytest.raises(ValueError, match="unknown PII"):
        pii_counts(docs, kinds=("ssn",))


def test_redact_pii_rE2_java_parity_on_fuzz(spark):
    """The redaction chain must agree between Spark (Java regex) and
    DuckDB (RE2) on adversarial boundary strings — the property the
    oracle row checks corpus-wide."""
    import duckdb

    from hadoop_search_engine_spark.operators.text_analysis import (
        redact_pii,
        sql_redact_duckdb,
    )

    rows = [
        (0, "a@b.co x@y.z"),            # minimal email + too-short TLD
        (1, "1.2.3.4.5.6"),             # overlapping dotted runs
        (2, "+1234567 end +12 34 56 78 90 12 34 56"),  # length bounds
        (3, "me@ex.com+99 (123) 45-67"),# email adjacent to phone chars
        (4, "256.300.1.1 and 999.999.999.999"),  # \b-boundary IPs
        (5, "a-b@c-d.info."),           # trailing dot
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    con = duckdb.connect()
    for i, s in rows:
        want = con.execute(
            f"SELECT {sql_redact_duckdb('?::varchar')}", [s]
        ).fetchone()[0]
        assert got[i] == want, (i, s, got[i], want)


def test_repetition_stats_and_filter(spark):
    from hadoop_search_engine_spark.operators.text_analysis import (
        repetition_filter,
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "buy now buy now buy now buy now"),   # heavy repeats
            (1, "all words here are fully distinct"),
            (2, "one"),                                # < n tokens
            (3, ""),                                   # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    # doc 0: 7 bigrams, 2 distinct ("buy now", "now buy")
    assert got[0]["n_ngrams"] == 7 and got[0]["n_distinct"] == 2
    assert abs(got[0]["dup_ratio"] - round(1 - 2 / 7, 6)) < 1e-9
    assert got[1]["dup_ratio"] == 0.0
    assert got[2]["n_ngrams"] == 0 and got[2]["dup_ratio"] == 0.0
    assert got[3]["dup_ratio"] == 0.0

    kept = {r["doc_id"]
            for r in repetition_filter(docs, max_dup_ratio=0.3).collect()}
    assert kept == {1, 2, 3}  # repetitive doc dropped, short docs pass


def test_corpus_mix_report_shares_sum_to_one(spark):
    from hadoop_search_engine_spark.operators.text_analysis import (
        corpus_mix_report,
    )

    docs = spark.createDataFrame(
        [
            (0, "en", "the quick brown fox and the dog"),
            (1, "en", "it is that good"),
            (2, "fr", "le chat noir"),
        ],
        "doc_id long, lang string, text string",
    )
    rep = {r["lang"]: r
           for r in corpus_mix_report(docs, by=("lang",)).collect()}
    assert rep["en"]["n_docs"] == 2 and rep["fr"]["n_docs"] == 1
    assert rep["en"]["n_tokens"] == 11 and rep["fr"]["n_tokens"] == 3
    assert abs(rep["en"]["doc_share"] - round(2 / 3, 6)) < 1e-9
    assert abs(rep["en"]["token_share"] - round(11 / 14, 6)) < 1e-9
    assert abs(sum(r["doc_share"] for r in rep.values()) - 1.0) < 1e-5
    assert all(0.0 <= r["avg_quality"] <= 1.0 for r in rep.values())

    import pytest as _pytest
    with _pytest.raises(ValueError, match="by"):
        corpus_mix_report(docs, by=())


def test_collocations_matches_python(spark):
    import math

    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.text_analysis import (
        collocations,
    )

    rows = [
        (0, "new york is big and new york is loud"),
        (1, "the new york subway runs all night"),
        (2, "a brand new day in york"),
        (3, "new york new york so good they named it twice"),
        (4, "is it new or is it old"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # pure-python PMI over adjacent token pairs
    pair_c, uni_c = {}, {}
    for _i, text in rows:
        toks = tokenize(text)
        for t in toks:
            uni_c[t] = uni_c.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            pair_c[(a, b)] = pair_c.get((a, b), 0) + 1
    N = sum(pair_c.values())
    T = sum(uni_c.values())
    want = {
        (a, b): (
            c, uni_c[a], uni_c[b],
            round(math.log((c / N) / ((uni_c[a] / T) * (uni_c[b] / T))), 6),
        )
        for (a, b), c in pair_c.items() if c >= 2
    }

    got = {
        (r["term_a"], r["term_b"]): (
            r["pair_count"], r["count_a"], r["count_b"], r["pmi"],
        )
        for r in collocations(docs, min_count=2).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert abs(got[k][3] - want[k][3]) < 1e-9
    # "new york" is the dominant collocation: most frequent pair,
    # positively associated (PMI > 0)
    assert ("new", "york") in got
    assert got[("new", "york")][0] == max(c for c, *_r in got.values())
    assert got[("new", "york")][3] > 0
    # min_count floor prunes reporting, not the probability space:
    # loosening it adds pairs but never changes surviving PMI values
    loose = {
        (r["term_a"], r["term_b"]): r["pmi"]
        for r in collocations(docs, min_count=1).collect()
    }
    assert len(loose) > len(got)
    for k in got:
        assert abs(loose[k] - got[k][3]) < 1e-9


def test_top_ngrams_hand_checked(spark):
    from hadoop_search_engine_spark.operators.text_analysis import top_ngrams

    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x"), (2, "z")],
        "doc_id long, text string",
    )
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 3), ("b a", 1), ("b c", 1),
    ]
    # trigrams, and a doc shorter than n contributes nothing
    rows3 = top_ngrams(docs, n=3, k=2).collect()
    assert [(r["gram"], r["n_occurrences"]) for r in rows3] == [
        ("a b a", 1), ("a b c", 1),
    ]


def test_zipf_fit_shape_and_partition_invariance(spark):
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.text_analysis import zipf_fit

    r2 = zipf_fit(gen_documents(spark, 150, n_partitions=2)).collect()[0]
    r8 = zipf_fit(gen_documents(spark, 150, n_partitions=8)).collect()[0]
    assert r2 == r8  # partitioning-invariant
    assert r2["slope"] < -0.5  # Zipfian corpus: steep negative slope
    assert 0.5 < r2["r2"] <= 1.0
    assert r2["n_terms"] > 100
