"""Structured Streaming surface: incremental tf deltas + windowed events."""

import glob
import os
import time

from pyspark.sql import functions as F

from hadoop_search_engine_spark.streaming.incremental import (
    incremental_tf_sink,
    stream_documents,
    windowed_event_counts,
)


def test_incremental_tf_sink_end_to_end(spark, tmp_path):
    from hadoop_search_engine_spark.corpus import gen_documents

    src = str(tmp_path / "incoming")
    delta = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # two "arrivals" of documents
    gen_documents(spark, 50, n_partitions=1).write.mode("append").parquet(src)
    gen_documents(spark, 50, n_partitions=1).where(
        F.col("url").endswith("7")
    ).write.mode("append").parquet(src)

    stream = stream_documents(spark, src, max_files=1)
    q = incremental_tf_sink(stream, delta, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)

    out = spark.read.parquet(os.path.join(delta, "tf"))
    assert out.columns == ["term", "doc_id", "tf", "epoch"]
    # every doc that arrived has tf rows; epochs prove micro-batching
    assert out.select("doc_id").distinct().count() == 50
    assert out.select("epoch").distinct().count() >= 2
    # tf of the canonical tokenizer matches the batch path for one doc
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    batch = term_frequencies(
        gen_documents(spark, 50, n_partitions=1).select(
            F.xxhash64("url").alias("doc_id"), "text"
        )
    )
    a = {(r["term"], r["doc_id"], r["tf"]) for r in batch.collect()}
    b = {(r["term"], r["doc_id"], r["tf"])
         for r in out.select("term", "doc_id", "tf").dropDuplicates().collect()}
    assert a == b

    # --- compaction: deltas -> full block index, score-identical to a
    # batch build of the same 50 docs (dense ids minted at compaction)
    from hadoop_search_engine_spark.operators.query_exec import Index, search_topk
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle
    from hadoop_search_engine_spark.streaming.incremental import compact_deltas

    idx_dir = str(tmp_path / "compacted")
    stats = compact_deltas(spark, delta, idx_dir, n_buckets=4, block_size=16)
    idx = Index.load(spark, idx_dir)
    doc_map = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(os.path.join(idx_dir, "doc_map")).collect()
    }
    corpus = gen_documents(spark, 50, n_partitions=1).select("url", "text").collect()
    url_to_text = {r["url"]: r["text"] for r in corpus}
    oracle = BM25Oracle(list(enumerate(url_to_text.values())))
    assert stats.n_docs == oracle.n_docs

    got = search_topk(idx, "w00000 w00010", k=10).collect()
    want_by_url = {}
    o2 = BM25Oracle([(i, t) for i, t in enumerate(url_to_text.values())])
    # compare via urls (doc_id spaces differ between builds)
    urls_sorted = list(url_to_text)
    want = o2.search("w00000 w00010", k=10)
    want_urls = {urls_sorted[d] for d, _ in want}
    got_urls = {doc_map[r["doc_id"]] for r in got}
    assert got_urls == want_urls
    want_scores = sorted(round(s, 9) for _, s in want)
    got_scores = sorted(round(r["score"], 9) for r in got)
    assert got_scores == want_scores


def test_compact_deltas_detects_doc_id_collision(spark, tmp_path):
    """Streaming doc_ids are xxhash64(url): a forged delta where two
    urls share one doc_id (the collision the hash could produce with
    probability ~n²/2^65) must fail loudly at compaction instead of
    silently merging two documents."""
    import pandas as pd
    import pytest

    from hadoop_search_engine_spark.streaming.incremental import compact_deltas

    delta = str(tmp_path / "delta")
    spark.createDataFrame(
        pd.DataFrame(
            {"term": ["alpha", "beta"], "doc_id": [7, 7], "tf": [1, 1],
             "epoch": [0, 1]}
        ).astype({"doc_id": "int64", "tf": "int64", "epoch": "int64"})
    ).write.mode("append").parquet(os.path.join(delta, "tf"))
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [7, 7], "url": ["https://a.example", "https://b.example"],
             "epoch": [0, 1]}
        ).astype({"doc_id": "int64", "epoch": "int64"})
    ).write.mode("append").parquet(os.path.join(delta, "docs"))
    with pytest.raises(RuntimeError, match="collision"):
        compact_deltas(spark, delta, str(tmp_path / "idx"), n_buckets=4)


def test_windowed_event_counts_stream(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "events_in")
    os.makedirs(src)
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2025-01-01 00:01:00", "2025-01-01 00:02:00", "2025-01-01 00:07:00"]
        ),
        "event_type": ["click", "click", "view"],
        "value": [1.0, 2.0, 3.0],
    })
    spark.createDataFrame(pdf).write.parquet(os.path.join(src, "batch0"))

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(os.path.join(src, "*"))
    )
    agg = windowed_event_counts(stream, window="5 minutes", watermark="1 minute")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wincounts")
        .option("checkpointLocation", str(tmp_path / "wc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from wincounts").collect()
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes the first window (00:00-00:05)
    got = {(r["win_start"].minute, r["event_type"], r["n"]) for r in rows}
    assert (0, "click", 2) in got


def test_positional_stream_compact_phrase(spark, tmp_path):
    """Streamed docs -> positional occurrence deltas -> compacted
    POSITIONAL index: phrase search matches the NumPy oracle over the
    same corpus (url-mapped — compaction mints its own dense ids),
    re-delivered docs dedup to one epoch."""
    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.query_exec import Index, phrase_search
    from hadoop_search_engine_spark.oracle.bm25_oracle import BM25Oracle
    from hadoop_search_engine_spark.streaming.incremental import compact_deltas

    src = str(tmp_path / "pincoming")
    delta = str(tmp_path / "pdelta")
    ckpt = str(tmp_path / "pckpt")
    os.makedirs(src)
    gen_documents(spark, 40, n_partitions=1).write.mode("append").parquet(src)
    # second arrival re-delivers a subset (same urls, same content)
    gen_documents(spark, 40, n_partitions=1).where(
        F.col("url").endswith("7")
    ).write.mode("append").parquet(src)

    stream = stream_documents(spark, src, max_files=1)
    q = (
        incremental_tf_sink(stream, delta, ckpt, positions=True)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(delta, "pos"))

    idx_dir = str(tmp_path / "pcompacted")
    stats = compact_deltas(
        spark, delta, idx_dir, n_buckets=4, block_size=16, positions=True
    )
    assert stats.positions
    idx = Index.load(spark, idx_dir)

    corpus = gen_documents(spark, 40, n_partitions=1).select("url", "text").collect()
    url_to_text = {r["url"]: r["text"] for r in corpus}
    assert stats.n_docs == len([t for t in url_to_text.values() if tokenize(t)])
    doc_map = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(os.path.join(idx_dir, "doc_map")).collect()
    }
    urls_sorted = list(url_to_text)
    oracle = BM25Oracle(list(enumerate(url_to_text.values())))

    toks = tokenize(corpus[0]["text"])
    for phrase in [" ".join(toks[:2]), " ".join(reversed(toks[:2])), "w00001 zzz"]:
        got = phrase_search(idx, phrase, k=10).collect()
        want = oracle.phrase_search(phrase, k=10)
        assert {doc_map[r["doc_id"]] for r in got} == {
            urls_sorted[d] for d, _ in want
        }, phrase
        assert sorted(round(r["score"], 9) for r in got) == sorted(
            round(s, 9) for _, s in want
        ), phrase
    # the fixture's first-doc head phrase must actually hit
    assert phrase_search(idx, " ".join(toks[:2]), k=10).count() > 0


def test_compact_deltas_positions_requires_pos_column(spark, tmp_path):
    """Feeding tf-only events to a positional build fails loudly."""
    import pytest

    from hadoop_search_engine_spark.operators.index_build import build_index

    events = spark.createDataFrame(
        [(0, 2, "alpha"), (0, 2, "beta")], "doc_id long, doc_len long, term string"
    )
    with pytest.raises(ValueError, match="pos"):
        build_index(
            spark, events, str(tmp_path / "noposidx"),
            docs_are_events=True, positions=True,
        )


def test_sessionize_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    """Stream the events through applyInPandasWithState in 1-file
    micro-batches: every CLOSED session must equal the batch
    sessionizer's row; each user's newest session stays open."""
    from datetime import datetime, timedelta

    from hadoop_search_engine_spark.operators.sessions import session_stats
    from hadoop_search_engine_spark.streaming.stateful import (
        sessionize_stream,
    )

    T0 = datetime(2024, 1, 1)
    rows1 = [
        (0, T0, 1, "view", 1.0),
        (1, T0 + timedelta(minutes=5), 1, "click", 2.0),
        (2, T0, 2, "view", 5.0),
    ]
    # batch 2 continues user 1's session (10') then breaks it (60'),
    # and breaks user 2's (90')
    rows2 = [
        (3, T0 + timedelta(minutes=10), 1, "buy", 3.0),
        (4, T0 + timedelta(minutes=70), 1, "view", 4.0),
        (5, T0 + timedelta(minutes=90), 2, "click", 6.0),
        (6, T0 + timedelta(minutes=91), 2, "buy", 7.0),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30.0)
        .writeStream.format("memory").queryName("closed_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_idx"]):
            (r["n_events"], r["start_us"], r["end_us"], r["value_sum"])
        for r in spark.sql("select * from closed_sessions").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want_all = {
        (r["user_id"], r["session_idx"]):
            (r["n_events"], int(r["start_us"]), int(r["end_us"]),
             r["value_sum"])
        for r in session_stats(batch, 30.0).collect()
    }
    # closed = all batch sessions minus each user's last (still open)
    last = {u: max(s for (uu, s) in want_all if uu == u)
            for u in {uu for (uu, _s) in want_all}}
    want_closed = {k: v for k, v in want_all.items()
                   if k[1] != last[k[0]]}
    assert got == want_closed
    assert (1, 0) in got and got[(1, 0)][0] == 3  # cross-batch merge


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    from datetime import datetime, timedelta

    from hadoop_search_engine_spark.streaming.stateful import dedup_stream

    T0 = datetime(2024, 1, 1)
    rows = [
        (0, T0, 1, "view", 1.0),
        (0, T0, 1, "view", 1.0),                        # exact dup
        (1, T0 + timedelta(minutes=1), 1, "click", 2.0),
        (1, T0 + timedelta(minutes=1), 1, "click", 2.0),
        (2, T0 + timedelta(minutes=2), 2, "view", 3.0),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    src = str(tmp_path / "ev2")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    q = (
        dedup_stream(stream, watermark="10 minutes")
        .writeStream.format("memory").queryName("deduped")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from deduped").collect()
    assert sorted(r["event_id"] for r in out) == [0, 1, 2]
