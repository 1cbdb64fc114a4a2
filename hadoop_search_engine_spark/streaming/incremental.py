"""Incremental indexing via Structured Streaming.

The reference is batch-only (SURVEY.md §2.8 — its only "streaming" is
HTTP byte-range video delivery, a transport concern). This module is
the forward-looking incremental-indexing path SURVEY.md §7 notes as
optional: newly-arrived documents flow through the same canonical
tokenizer into per-micro-batch (term, doc_id, tf) delta tables, which
``foreachBatch`` appends transactionally; a periodic compaction merges
deltas into the main block index by re-running the builder over the
affected term buckets.

Also carries the event-analytics streaming operators (watermarked
windowed aggregation over the ``events`` table shape) so the engine's
streaming surface is testable against the driver's testdata.
"""

from __future__ import annotations

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


def incremental_tf_sink(docs_stream: DataFrame, delta_dir: str, checkpoint_dir: str):
    """documents stream -> append-only (term, doc_id, tf) delta tables.

    doc_id is xxhash64(url) in the streaming path (dense re-assignment
    happens at compaction, where the global order is known).
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        docs = batch_df.select(F.xxhash64("url").alias("doc_id"), "text")
        tf = term_frequencies(docs).withColumn("epoch", F.lit(epoch_id))
        tf.write.mode("append").parquet(delta_dir)

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )


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
