from __future__ import annotations

import os

import pytest

from hadoop_search_engine_spark.operators.percolate import (
    compile_queries,
    percolate,
)

DOCS = [
    (0, "alpha beta gamma"),
    (1, "alpha delta"),
    (2, "beta delta epsilon"),
    (3, "zeta eta"),
    (4, "alpha beta delta"),
]

QUERIES = [
    {"query_id": "any_ab", "query_text": "alpha beta"},                # or
    {"query_id": "all_ab", "query_text": "alpha beta", "mode": "and"},
    {"query_id": "m2of3", "query_text": "alpha beta delta", "min_match": 2},
    {"query_id": "never", "query_text": "omega", "mode": "and"},
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _matches(spark):
    out = {}
    for r in percolate(_docs(spark), QUERIES).collect():
        out.setdefault(r["query_id"], set()).add(r["doc_id"])
    return out


def test_percolate_or_and_msm(spark):
    got = _matches(spark)
    assert got["any_ab"] == {0, 1, 2, 4}
    assert got["all_ab"] == {0, 4}
    assert got["m2of3"] == {0, 1, 2, 4}
    assert "never" not in got


def test_percolate_n_matched_counts(spark):
    rows = {
        (r["query_id"], r["doc_id"]): r["n_matched"]
        for r in percolate(_docs(spark), QUERIES).collect()
    }
    assert rows[("m2of3", 4)] == 3
    assert rows[("m2of3", 0)] == 2
    assert rows[("any_ab", 1)] == 1


def test_percolate_agrees_with_forward_search(spark):
    """Reverse search == forward search, per query: percolate's doc
    set must equal matched_docs_dataframe's for the same corpus."""
    from hadoop_search_engine_spark.operators.query_exec import (
        matched_docs_dataframe,
    )

    docs = _docs(spark)
    got = _matches(spark)
    for q in QUERIES:
        fwd = {
            r["doc_id"]
            for r in matched_docs_dataframe(
                docs, q["query_text"], mode=q.get("mode", "or")
            ).collect()
        }
        if "min_match" not in q:
            assert got.get(q["query_id"], set()) == fwd, q["query_id"]


def test_percolate_synonyms(spark):
    got = {
        r["doc_id"]
        for r in percolate(
            _docs(spark),
            [{"query_id": "syn", "query_text": "ALPHA?"}],
            synonyms={"alpha?": "alpha"},
        ).collect()
    }
    assert got == {0, 1, 4}


def test_compile_queries_validation():
    with pytest.raises(ValueError, match="duplicate"):
        compile_queries(
            [{"query_id": "a", "query_text": "x"},
             {"query_id": "a", "query_text": "y"}]
        )
    with pytest.raises(ValueError, match="no tokens"):
        compile_queries([{"query_id": "a", "query_text": "  "}])
    with pytest.raises(ValueError, match="mode"):
        compile_queries([{"query_id": "a", "query_text": "x", "mode": "not"}])
    with pytest.raises(ValueError, match="never match"):
        compile_queries(
            [{"query_id": "a", "query_text": "x y", "min_match": 3}]
        )


def test_percolate_dataframe_registry_matches_list_path(spark):
    """Million-query registries pass as a compiled (query_id, term,
    n_required) DataFrame — same semantics as the broadcast list."""
    rows = compile_queries(QUERIES)
    reg = spark.createDataFrame(
        rows, "query_id string, term string, n_required int"
    )
    via_list = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(_docs(spark), QUERIES).collect()
    }
    via_df = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(_docs(spark), reg).collect()
    }
    assert via_df == via_list


def test_percolate_stream_foreachbatch(spark, tmp_path):
    """The selling point: the same transformation percolates a doc
    stream per micro-batch (alerting shape)."""
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(
        os.path.join(src, "batch0")
    )
    hits: list = []

    def sink(batch_df, _epoch):
        hits.extend(
            (r["doc_id"], r["query_id"])
            for r in percolate(batch_df, QUERIES).collect()
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "perc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert (4, "all_ab") in hits and (3, "any_ab") not in hits
    assert {qid for _, qid in hits} == {"any_ab", "all_ab", "m2of3"}


def test_percolate_stream_matches_batch(spark, tmp_path):
    """Streaming percolation (availableNow over a parquet dir) emits
    exactly the batch percolate rows."""
    from hadoop_search_engine_spark.streaming.stateful import (
        percolate_stream,
    )

    docs = _docs(spark)
    src = str(tmp_path / "stream_src")
    docs.write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    got: list[tuple] = []

    def sink(matches, epoch_id):
        got.extend(
            (r["doc_id"], r["query_id"], r["n_matched"])
            for r in matches.collect()
        )

    q = (
        percolate_stream(stream, QUERIES, sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(docs, QUERIES).collect()
    )
    assert sorted(got) == want
    assert len(want) > 0
