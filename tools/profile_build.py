"""Phase-level profile of the index build (find serial components).

Usage: python tools/profile_build.py [n_docs] [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from hadoop_search_engine_spark.corpus import gen_documents
    from hadoop_search_engine_spark.operators.doc_ids import assign_doc_ids
    from hadoop_search_engine_spark.operators.index_build import (
        IndexStats,
        _bucket_col,
        _make_encoder,
        POSTINGS_SCHEMA,
        term_frequencies_with_dl,
        write_stats,
    )
    from hadoop_search_engine_spark.session import get_spark

    spark = get_spark(master=f"local[{CORES}]", shuffle_partitions=CORES)
    t: dict[str, float] = {}

    def mark(name: str, t0: float) -> None:
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", flush=True)

    t0 = time.time()
    corpus = "/tmp/hse_scaling_corpus.parquet"
    if not os.path.isdir(corpus):
        (assign_doc_ids(gen_documents(spark, N, n_partitions=64), num_partitions=64)
            .select("doc_id", "text").write.mode("overwrite").parquet(corpus))
    docs = spark.read.parquet(corpus).select("doc_id", "text")
    mark("corpus parquet ready (untimed in bench)", t0)

    out = f"/tmp/profile_idx_{CORES}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    total0 = time.time()

    t0 = time.time()
    from hadoop_search_engine_spark.functions.tokenizer import tokens_col
    ds = docs.select("doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("doc_len"))
    ds.write.mode("overwrite").parquet(os.path.join(out, "doc_stats_flat"))
    agg = (spark.read.parquet(os.path.join(out, "doc_stats_flat"))
        .agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl"),
             F.max("doc_id").alias("max_id")).collect()[0])
    mark("doc_stats_flat write + agg", t0)

    n_docs, avgdl, max_id = int(agg["n"]), float(agg["avgdl"]), int(agg["max_id"])
    num_shards = max(1, (max_id + 1 + (1 << 17) - 1) >> 17)
    shard_span = max(1, -(-(max_id + 1) // num_shards))
    stats = IndexStats(n_docs=n_docs, avgdl=avgdl, shard_span=shard_span,
                       num_shards=num_shards, n_buckets=16, block_size=128,
                       k1=1.2, b=0.75)
    write_stats(out, stats)

    t0 = time.time()
    (spark.read.parquet(os.path.join(out, "doc_stats_flat"))
       .withColumn("shard", (F.col("doc_id") / F.lit(shard_span)).cast("int"))
       .repartition("shard").write.mode("overwrite")
       .parquet(os.path.join(out, "doc_stats")))
    mark("doc_stats write", t0)

    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    enriched = (
        toks.select("doc_id", F.size("toks").cast("long").alias("doc_len"),
                    F.explode("toks").alias("term"))
        .withColumn("shard", (F.col("doc_id") / F.lit(shard_span)).cast("int"))
        .withColumn("bucket", _bucket_col(F.col("term"), 16))
    )
    encoder = _make_encoder(stats)

    t0 = time.time()
    blocks = enriched.groupBy("term", "shard").applyInPandas(
        encoder, schema=POSTINGS_SCHEMA
    )
    (blocks.repartition("bucket", "term")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(os.path.join(out, "postings")))
    mark("encode + postings write", t0)

    t0 = time.time()
    (spark.read.parquet(os.path.join(out, "postings"))
        .groupBy("term", "bucket")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_blocks"),
             F.sum("tf_sum").alias("tokens"), F.sum("n_bytes").alias("bytes"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(os.path.join(out, "term_stats")))
    mark("term_stats write", t0)

    t0 = time.time()
    counters = (spark.read.parquet(os.path.join(out, "term_stats"))
        .groupBy("bucket").agg(F.count("*").alias("terms")).collect())
    mark("counters collect", t0)

    t0 = time.time()
    lex = spark.read.parquet(os.path.join(out, "term_stats")).select(
        "term", "bucket", "df", "n_blocks")
    lex.write.mode("overwrite").parquet(os.path.join(out, "lexicon"))
    mark("lexicon write", t0)

    total = time.time() - total0
    print(f"TOTAL build phases: {round(total, 2)}s  ({round(N / total, 1)} docs/s, cores={CORES})")
    spark.stop()


if __name__ == "__main__":
    main()
