"""Round-4 skew drill (VERDICT r03 #5): an adversarial corpus with a
head term in EVERY document (df == N), a domain owning half the crawl,
a viral URL re-fetched by half the corpus, and a banner line in every
doc — the shapes that melt a naive window/groupBy plan at 100 TB.

Claimed mechanisms under test, with the group sizes MEASURED:

* index encode wave: the fixed shard span bounds every (term, shard)
  posting group at shard_span regardless of term df — a df=N term
  splits into N/span groups instead of one N-row reducer;
* url_dedup: winner = map-side-combinable groupBy(url_norm).min(id),
  so the viral URL never lands on one reducer as raw rows;
* cap_per_domain(skew_buckets=B): identical output to the plain
  window with the max per-task partition cut by B;
* dedup_lines: banner df counted on the xxhash64 groupBy (map-side
  partials), never a window over line copies.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 40_000
SPAN = 4_096


@pytest.fixture(scope="module")
def skew_corpus(spark):
    """doc i: 'hotterm' in every doc (df=N); half the urls are ONE
    viral page behind rotating utm params on a single hot domain; a
    banner line opens every text."""
    df = spark.range(0, N, numPartitions=8).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("BANNER COOKIES ACCEPT\nhotterm w"),
            F.lpad((F.col("id") % 997).cast("string"), 4, "0"),
            F.lit(" filler"),
            (F.col("id") % 13).cast("string"),
            F.lit("\nunique line "),
            F.col("id").cast("string"),
        ).alias("text"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("https://hot.example/viral?utm_source=s"),
                F.col("id").cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"),
                (F.col("id") % 500).cast("string"),
                F.lit(".example/page/"),
                F.col("id").cast("string"),
            )
        )
        .alias("url"),
    )
    return df.persist()


@pytest.fixture(scope="module")
def skew_index(spark, skew_corpus, tmp_path_factory):
    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    out = str(tmp_path_factory.mktemp("skewix") / "ix")
    build_index(
        spark,
        skew_corpus.select("doc_id", "text"),
        out,
        shard_span=SPAN,
        n_buckets=8,
    )
    return Index.load(spark, out)


def test_head_term_group_bound(skew_index):
    """df('hotterm') == N, yet no (term, shard) posting group exceeds
    the shard span — the encode wave's reducer-skew cap, measured."""
    lex = skew_index.lexicon.where(F.col("term") == "hotterm").collect()
    assert len(lex) == 1 and lex[0]["df"] == N
    h = lex[0]["term_hash"]
    groups = (
        skew_index.postings.where(F.col("term_hash") == h)
        .groupBy("shard")
        .agg(F.sum("n_docs").alias("g"))
        .collect()
    )
    assert len(groups) == N // SPAN + (1 if N % SPAN else 0)
    max_g = max(r["g"] for r in groups)
    assert max_g <= SPAN, f"head-term group {max_g} exceeds span {SPAN}"
    # and globally, for EVERY term
    allmax = (
        skew_index.postings.groupBy("term_hash", "shard")
        .agg(F.sum("n_docs").alias("g"))
        .agg(F.max("g"))
        .collect()[0][0]
    )
    assert allmax <= SPAN


def test_head_term_queries_work(skew_index):
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    hits = search_topk(skew_index, "hotterm", k=10).collect()
    assert len(hits) == 10 and all(r["score"] > 0 for r in hits)
    # conjunctive head+rare: rare term w0001 appears in ~N/997 docs
    both = search_topk(skew_index, "hotterm w0001", k=10, mode="and").collect()
    assert 0 < len(both) <= 10
    # the hot term contributes ~0 idf (df==N) but must not poison
    # scoring: rare-term-only ranking equals the conjunctive doc set
    rare = search_topk(skew_index, "w0001", k=10).collect()
    assert {r["doc_id"] for r in both} == {r["doc_id"] for r in rare}


def test_viral_url_dedup(skew_corpus):
    from hadoop_search_engine_spark.operators.urltools import url_dedup

    kept = url_dedup(skew_corpus).persist()
    viral = kept.where(F.col("url_norm").contains("viral")).collect()
    # one survivor for the N/2 viral fetches, the lowest doc_id (0)
    assert len(viral) == 1 and viral[0]["doc_id"] == 0
    # distinct non-viral canonicals all survive
    assert kept.count() == 1 + N // 2
    kept.unpersist()


def test_hot_domain_cap_skew_buckets_identical(skew_corpus):
    from hadoop_search_engine_spark.operators.urltools import cap_per_domain

    plain = {
        r["doc_id"] for r in cap_per_domain(skew_corpus, 50).collect()
    }
    bucketed = {
        r["doc_id"]
        for r in cap_per_domain(skew_corpus, 50, skew_buckets=8).collect()
    }
    assert plain == bucketed  # exact two-phase equivalence under skew
    # hot.example owns N/2 docs but is capped to 50
    hot_kept = sum(
        1
        for r in cap_per_domain(skew_corpus, 50, skew_buckets=8).collect()
        if "hot.example" in r["url"]
    )
    assert hot_kept == 50


def test_banner_line_dedup(spark, skew_corpus):
    from hadoop_search_engine_spark.operators.curate import dedup_lines

    out = dedup_lines(skew_corpus.select("doc_id", "text"),
                      max_line_df=3, mode="drop_all").persist()
    # every doc survives (its unique line is below the df threshold)
    assert out.count() == N
    # the banner (df == N) is gone everywhere
    assert out.where(F.col("text").contains("BANNER")).count() == 0
    # unique lines intact
    assert out.where(F.col("text").endswith("unique line 7")).count() == 1
    out.unpersist()


def test_span_signature_survives_32bit_murmur_collision(spark):
    """Round-4 sf0.1 board catch: Spark's hash(col, lit(salt)) CHAINS
    (salt round seeded by the first hash), so a (murmur, salted-
    murmur) pair collides whenever the unsalted 32-bit hashes collide
    — 'column column column join fast spark' and 'table order slow
    big column small' are such a pair in the sf0.1 corpus, and span
    dedup over-flagged the non-duplicate one. The signature is now
    xxhash64 + murmur (independent functions): two docs sharing only
    a murmur-colliding gram must NOT be flagged as duplicates."""
    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.operators.dedup import (
        duplicate_span_stats,
    )

    g1 = "column column column join fast spark"
    g2 = "table order slow big column small"
    # confirm the underlying murmur32 collision still holds (Spark's
    # hash function is stable) — the regression precondition
    r = spark.createDataFrame([(g1,), (g2,)], "g string").select(
        F.hash("g").alias("h"), F.hash("g", F.lit("spandedup")).alias("hs")
    ).collect()
    assert r[0]["h"] == r[1]["h"] and r[0]["hs"] == r[1]["hs"]

    docs = spark.createDataFrame(
        [(0, "intro words here " + g1 + " tail words end"),
         (1, "other start text " + g2 + " closing words now")],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r["n_dup_grams"]
             for r in duplicate_span_stats(docs, n=6).collect()}
    assert stats == {0: 0, 1: 0}, stats  # no cross-doc duplicate exists
