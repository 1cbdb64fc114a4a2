from pyspark.sql import functions as F

from hadoop_search_engine_spark.corpus import (
    extract_text,
    gen_document_row,
    gen_documents,
    reference_queries,
)


def test_row_reproducible_in_isolation():
    a, b = gen_document_row(123), gen_document_row(123)
    assert a == b
    assert a["url"] == "https://site123.example/page/123"


def test_text_extraction_invariant(spark):
    # the per-row invariant: extractor(html) == text for every row,
    # verified distributed vs the pure-Python extractor
    docs = gen_documents(spark, 300, n_partitions=3)
    rows = docs.collect()
    assert len(rows) == 300
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"]


def test_partitioning_invariance(spark):
    a = gen_documents(spark, 250, n_partitions=2).orderBy("url").collect()
    b = gen_documents(spark, 250, n_partitions=7).orderBy("url").collect()
    assert a == b


def test_signal_terms_planted(spark):
    docs = gen_documents(spark, 40, n_partitions=2)
    hits = (
        docs.select("url", "text")
        .where(F.col("text").contains("needle7"))
        .collect()
    )
    assert sorted(r["url"] for r in hits) == [
        "https://site10.example/page/10",
        "https://site20.example/page/20",
        "https://site30.example/page/30",
    ]
    for r in hits:
        assert r["text"].split().count("needle7") == 3


def test_lang_distribution(spark):
    docs = gen_documents(spark, 2000, n_partitions=4)
    counts = dict(
        (r["lang"], r["count"]) for r in docs.groupBy("lang").count().collect()
    )
    assert set(counts) == {"en", "es", "und"}
    assert counts["en"] > 1600
    assert counts["und"] < 100


def test_reference_queries_shape():
    qs = reference_queries()
    assert len(qs) == 50
    assert [q["qid"] for q in qs] == list(range(50))
    assert any(q["k"] == 1 for q in qs)
    assert any(q["k"] == 100 for q in qs)
    assert any("needle7" in q["query_text"].lower() for q in qs)
