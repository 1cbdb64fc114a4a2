"""Incremental indexing via Structured Streaming.

The reference is batch-only (SURVEY.md §2.8 — its only "streaming" is
HTTP byte-range video delivery, a transport concern). This module is
the forward-looking incremental-indexing path SURVEY.md §7 notes as
optional: newly-arrived documents flow through the same canonical
tokenizer into per-micro-batch (term, doc_id, tf) delta tables, which
``foreachBatch`` appends transactionally; :func:`compact_deltas` then
merges the accumulated deltas into a full block index — dense doc_id
re-assignment, posting encode, lexicon — by feeding the already-
tokenized tf rows straight into the batch builder's event path (no
re-tokenization of the stream's documents).

Also carries the event-analytics streaming operators (watermarked
windowed aggregation over the ``events`` table shape) so the engine's
streaming surface is testable against the driver's testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import DOCUMENTS_SCHEMA
from ..operators.index_build import term_frequencies


def stream_documents(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream of input_hint-shaped parquet documents."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def incremental_tf_sink(
    docs_stream: DataFrame, delta_dir: str, checkpoint_dir: str,
    positions: bool = False,
    stopwords: tuple = (),
    stem: str = "none",
    fold: bool = False,
    cjk: bool = False,
):
    """documents stream -> append-only delta tables under ``delta_dir``:
    ``tf/`` holds (term, doc_id, tf, epoch), ``docs/`` holds
    (doc_id, url, epoch) for the compaction-time url mapping.

    ``positions=True`` writes ``pos/`` occurrence deltas
    (doc_id, term, pos, epoch) — one row per token with its 0-based
    position — instead of aggregated tf, so compaction can build a
    POSITIONAL index (phrase search over streamed documents). The
    volume is one row per token either way pre-aggregation; positions
    just keep the occurrence granularity the phrase scorer needs.

    doc_id is xxhash64(url) in the streaming path (dense re-assignment
    happens at compaction, where the global order is known).

    ``stopwords`` / ``stem`` apply the analysis chain
    (functions/analyzer.py) to each micro-batch BEFORE tokenizing —
    a stream feeding an ANALYZED base index must pass the base's own
    config (compaction then records it via ``compact_deltas``'s
    build kwargs; `merge_indexes` refuses mixed-analyzer segments).
    """
    from ..functions.analyzer import analyzed_text_col
    from ..functions.tokenizer import tokens_col

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        docs = batch_df.select(F.xxhash64("url").alias("doc_id"), "url", "text")
        if stopwords or stem != "none" or fold or cjk:
            docs = docs.withColumn(
                "text",
                analyzed_text_col(F.col("text"), stopwords, stem, fold, cjk),
            )
        if positions:
            occ = (
                docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
                .select("doc_id", F.posexplode("toks").alias("pos", "term"))
                .select("doc_id", "term", "pos")
                .withColumn("epoch", F.lit(epoch_id))
            )
            occ.write.mode("append").parquet(os.path.join(delta_dir, "pos"))
        else:
            tf = term_frequencies(docs.select("doc_id", "text")).withColumn(
                "epoch", F.lit(epoch_id)
            )
            tf.write.mode("append").parquet(os.path.join(delta_dir, "tf"))
        docs.select("doc_id", "url").withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(os.path.join(delta_dir, "docs"))

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )


def compact_deltas(spark: SparkSession, delta_dir: str, out_dir: str, **build_kwargs):
    """Merge accumulated tf deltas into a full block index at ``out_dir``.

    1. dedup re-delivered (term, doc) rows across epochs (documents are
       immutable in this model — identical url => identical tf);
    2. mint DENSE doc_ids over the distinct streamed hash ids (the
       hashed ids are 64-bit-sparse, which both varint deltas and the
       doc_id<<20 packing would reject);
    3. reconstruct token-occurrence events (term repeated tf times,
       doc_len riding along) and run the batch builder's event path —
       one corpus-shuffle encode, same postings layout, no
       re-tokenization;
    4. write ``doc_map(doc_id, url)`` beside the index.

    Returns IndexStats. At 10^12 scale the deltas are already
    bucket-partitioned by the sink's groupBy, so the compaction cost is
    the same single sort-shuffle as a batch build of the delta volume.

    With ``positions=True`` (in ``build_kwargs``) the compaction reads
    the positional sink's ``pos/`` occurrence deltas instead of
    ``tf/``: re-delivered docs dedup by keeping each doc's FIRST epoch
    (documents are immutable, so any epoch's occurrence set is
    identical), ``doc_len`` is the occurrence count, and the events
    carry ``pos`` into the batch builder's positional event path —
    the compacted index serves phrase queries like a batch build.
    """
    from ..operators.doc_ids import assign_doc_ids
    from ..operators.index_build import build_index

    positional = bool(build_kwargs.get("positions"))
    occ = None
    if positional:
        pos_df = spark.read.parquet(os.path.join(delta_dir, "pos"))
        first = pos_df.groupBy("doc_id").agg(F.min("epoch").alias("epoch"))
        occ = (
            pos_df.join(first, ["doc_id", "epoch"])
            .withColumnRenamed("doc_id", "orig_id")
            .select("orig_id", "term", "pos")
        )
        tf = occ.groupBy("term", "orig_id").agg(F.count("*").alias("tf"))
    else:
        tf = (
            spark.read.parquet(os.path.join(delta_dir, "tf"))
            .groupBy("term", "doc_id")
            .agg(F.max("tf").alias("tf"))
            .withColumnRenamed("doc_id", "orig_id")
        )
    docs_delta = spark.read.parquet(os.path.join(delta_dir, "docs"))
    # streaming doc_ids are xxhash64(url): a collision (two urls, one
    # hash) would silently merge two documents' tf rows into one —
    # detect it here the same way _write_lexicon guards term hashes
    # (one agg over the url-sized delta, probability ~n²/2^65).
    cnt = docs_delta.agg(
        F.countDistinct("url").alias("nu"),
        F.countDistinct("doc_id").alias("nh"),
    ).collect()[0]
    if int(cnt["nu"]) != int(cnt["nh"]):
        raise RuntimeError(
            f"xxhash64 url collision in streaming deltas: "
            f"{int(cnt['nu'])} distinct urls map to {int(cnt['nh'])} "
            "distinct doc_ids; re-ingest the colliding batch with a "
            "salted id (e.g. xxhash64(url, seed))"
        )
    urls = (
        docs_delta
        .groupBy("doc_id")
        .agg(F.min("url").alias("url"))
        .withColumnRenamed("doc_id", "orig_id")
    )
    mapping = assign_doc_ids(urls, key_col="orig_id").persist()
    dls = tf.groupBy("orig_id").agg(F.sum("tf").alias("doc_len"))
    if positional:
        events = (
            occ.join(dls, "orig_id")
            .join(mapping.select("orig_id", "doc_id"), "orig_id")
            .select("doc_id", "doc_len", "term", "pos")
        )
    else:
        events = (
            tf.join(dls, "orig_id")
            .join(mapping.select("orig_id", "doc_id"), "orig_id")
            .select(
                "doc_id",
                "doc_len",
                F.explode(F.array_repeat("term", F.col("tf").cast("int"))).alias("term"),
            )
        )
    stats = build_index(spark, events, out_dir, docs_are_events=True, **build_kwargs)
    mapping.select("doc_id", "url").write.mode("overwrite").parquet(
        os.path.join(out_dir, "doc_map")
    )
    mapping.unpersist()
    return stats


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding event-type counts (late data dropped
    past the watermark) — the standard streaming aggregation shape."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
