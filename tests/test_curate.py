"""End-to-end corpus curation: annotate -> filter -> exact dedup ->
minhash near-dedup (operators/curate.py). The composed pipeline is
also value-hash checked against DuckDB at sf0.01 via the
``curated_docs`` oracle entry (test_oracle_parity)."""

from __future__ import annotations

from hadoop_search_engine_spark.operators.curate import (
    curate_corpus,
    curation_report,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = (
    "completely different content about the spark engine and its "
    "inverted index for the win"
)
SPANISH = "el perro y la casa de la familia grande en la ciudad vieja"


def test_curate_pipeline_keeps_expected_survivors(spark):
    rows = [
        (0, BASE),        # keeper: near-dup cluster representative
        (1, NEAR),        # near-dup of 0 (smaller id wins) -> dropped
        (2, BASE),        # exact dup of 0 -> dropped at the digest stage
        (3, OTHER),       # keeper: distinct english doc
        (4, SPANISH),     # dropped by the lang filter (langs=en only)
        (5, "too short"), # dropped by min_tokens
        (6, ""),          # dropped (0 tokens)
        (7, None),        # dropped (null text)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(
        docs, min_tokens=5, min_quality=0.2, langs=("en",),
        near_threshold=0.5,
    )
    got = {r["doc_id"]: r for r in curated.collect()}
    assert set(got) == {0, 3}
    assert got[0]["lang_pred"] == "en" and got[3]["lang_pred"] == "en"
    assert got[0]["n_tokens"] == 13
    assert all(0.0 <= got[i]["quality"] <= 1.0 for i in got)
    assert got[0]["fingerprint"] != got[3]["fingerprint"]

    rep = curation_report(docs, curated)
    assert rep["docs_in"] == 8 and rep["docs_out"] == 2
    assert rep["dropped"] == 6
    assert rep["tokens_out"] == got[0]["n_tokens"] + got[3]["n_tokens"]


def test_curate_greedy_drop_keeps_lowest_id_per_chain(spark):
    """Three mutually-near docs: only the lowest id survives (every
    other doc has a smaller-id near-dup)."""
    rows = [
        (10, BASE),
        (11, BASE.replace("today", "yesterday")),
        (12, BASE.replace("dog", "cat")),
        (13, OTHER),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(
        docs, min_tokens=5, min_quality=0.2, langs=("en",),
        near_threshold=0.5,
    )
    assert {r["doc_id"] for r in curated.collect()} == {10, 13}
