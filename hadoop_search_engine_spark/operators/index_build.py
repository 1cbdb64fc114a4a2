"""Inverted-index build: documents -> sharded compressed posting blocks.

The reference builds its index as ``distinct -> groupBy(entity) ->
collect_list(video_name) -> saveAsTable`` (/root/reference/README.md:
423-436) — raw string arrays, no tf, no compression, no skew handling.
This builder keeps the same logical shape (tokenize -> dedup-to-tf ->
group-by-term -> materialize posting lists) but re-engineers the
physical design for 10^12 documents:

  * tokenize with JVM-side expressions (whole-stage codegen), not
    per-row Python — the analog of the reference's
    ``explode(split(lower(col)))`` branches (README.md:372-402);
  * ``groupBy(term, doc_id).count()`` replaces ``.distinct()``
    (README.md:424) — Catalyst plans partial (map-side) aggregation,
    and tf comes out for free;
  * **sharding = salting**: every posting carries
    ``shard = doc_id // shard_span`` (a contiguous doc_id range).
    Posting-block groups are ``(term, shard)``, so a Zipf head term
    with df ≈ N is split across all shards into bounded groups (the
    skew salt), while blocks remain globally sorted by doc_id within a
    term (ORDER BY term, shard, block_id == ORDER BY term, doc_id) —
    no post-hoc external merge of salted runs is needed, and the query
    side gets document-sharded parallelism for free;
  * per-(term, shard) groups are encoded by an Arrow ``applyInPandas``
    UDF into 128-doc blocks: delta+varint doc_ids, varint tfs, and an
    idf-independent per-block WAND bound
    ``max(tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)))`` (multiplied by idf
    at query time, so df statistics are not needed inside the encoder);
  * postings are written partitioned by ``bucket = hash(term) % B``
    so a query's term lookups prune to B^-1 of the files;
  * the build runs in ``n_waves`` bucket waves, each an independent
    distributed job that commits its partition directories plus a
    checkpoint row (terms/blocks/postings/tokens/bytes counters) —
    killing the build between waves loses only the in-flight wave and
    ``resume=True`` rebuilds exactly the missing buckets (anti-join
    against committed checkpoints).

Storage is plain Parquet in an Iceberg-like layout (partition dirs +
stats + lineage tables); the Iceberg catalog itself is swapped in via
``sources.catalog`` when its jars are on the classpath.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BLOCK_SIZE, BM25_B, BM25_K1
from ..functions import codec
from ..functions.bm25 import idf_col
from ..functions.tokenizer import tokens_col

POSTINGS_SCHEMA = (
    "term string, shard int, block_id int, first_doc_id long, "
    "doc_ids binary, tfs binary, n_docs int, tf_sum long, "
    "block_max double, bucket int"
)


@dataclass(frozen=True)
class IndexStats:
    n_docs: int
    avgdl: float
    shard_span: int
    num_shards: int
    n_buckets: int
    block_size: int
    k1: float
    b: float


def _stats_path(out_dir: str) -> str:
    return os.path.join(out_dir, "stats.json")


def write_stats(out_dir: str, stats: IndexStats) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(_stats_path(out_dir), "w") as f:
        json.dump(stats.__dict__, f)


def read_stats(out_dir: str) -> IndexStats:
    with open(_stats_path(out_dir)) as f:
        return IndexStats(**json.load(f))


def term_frequencies(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (term, doc_id, tf).

    One wide-dependency: the (term, doc_id) hash aggregation, with
    map-side partial aggregation supplied by Catalyst. This subsumes
    the reference's ``.distinct()`` dedup (README.md:424) — duplicate
    (term, doc) pairs become the tf count instead of being dropped.
    """
    terms = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    return terms.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def doc_stats(tf: DataFrame) -> DataFrame:
    """(term, doc_id, tf) -> (doc_id, doc_len)."""
    return tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))


def _make_encoder(stats: IndexStats):
    block_size, k1, b, avgdl = stats.block_size, stats.k1, stats.b, stats.avgdl
    shard_span, n_buckets = stats.shard_span, stats.n_buckets

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # One group == one (term, shard): all postings of `term` whose
        # doc_id falls in [shard*span, (shard+1)*span). Bounded size by
        # construction (<= shard_span docs), so the pandas materialization
        # can never blow up on a head term — the process.py:223 collect()
        # mistake is structurally impossible here.
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iat[0]
        shard = int(pdf["shard"].iat[0])
        bucket = int(pdf["bucket"].iat[0])
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["doc_len"].to_numpy(np.float64)
        partial = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        rows = []
        for blk, start in enumerate(range(0, len(doc_ids), block_size)):
            d = doc_ids[start : start + block_size]
            t = tfs[start : start + block_size]
            p = partial[start : start + block_size]
            rows.append(
                (
                    term,
                    shard,
                    blk,
                    int(d[0]),
                    codec.encode_doc_ids(d, base=int(d[0])),
                    codec.encode_tfs(t),
                    len(d),
                    int(t.sum()),
                    float(p.max()),
                    bucket,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "shard", "block_id", "first_doc_id", "doc_ids",
                "tfs", "n_docs", "tf_sum", "block_max", "bucket",
            ],
        )

    return encode_group


def decode_block(row) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of the encoder for one block row (dict-like or pd row)."""
    d = codec.decode_doc_ids(bytes(row["doc_ids"]), n=int(row["n_docs"]),
                             base=int(row["first_doc_id"]))
    t = codec.decode_tfs(bytes(row["tfs"]), n=int(row["n_docs"]))
    return d, t


def _bucket_col(term: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    num_shards: int | None = None,
    n_buckets: int = 16,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    n_waves: int = 1,
    resume: bool = False,
    fail_after_waves: int | None = None,
) -> IndexStats:
    """Build the full index at ``out_dir`` from documents(doc_id, text).

    ``n_waves`` > 1 splits the bucket range into that many sequential
    distributed jobs, each committing postings + a checkpoint row;
    ``resume=True`` skips buckets already committed. ``fail_after_waves``
    is a test hook that raises after N committed waves (kill/resume test).
    """
    postings_dir = os.path.join(out_dir, "postings")
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if not resume and os.path.isdir(out_dir):
        # fresh-build semantics are overwrite (the reference's
        # DROP TABLE IF EXISTS / mode("overwrite"), README.md:433-436);
        # appending postings over an existing index would silently
        # duplicate blocks and double scores.
        import shutil

        shutil.rmtree(out_dir)
    done: set[int] = set()
    if resume and os.path.exists(ckpt_dir):
        done = {
            r["bucket"]
            for r in spark.read.parquet(ckpt_dir).select("bucket").collect()
        }

    tf = term_frequencies(docs)
    tf.persist()
    phase0_done = resume and os.path.exists(_stats_path(out_dir)) and -1 in done
    if phase0_done:
        stats = read_stats(out_dir)
    else:
        ds = doc_stats(tf)
        agg = ds.agg(
            F.count("*").alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_id"),
        ).collect()[0]
        n_docs, avgdl, max_id = int(agg["n"]), float(agg["avgdl"]), int(agg["max_id"])
        if num_shards is None:
            # target <= ~256k docs per shard, at least the session's
            # parallelism so every core gets query-time work.
            num_shards = max(
                spark.sparkContext.defaultParallelism,
                (max_id + 1 + (1 << 18) - 1) >> 18,
            )
        shard_span = max(1, -(-(max_id + 1) // num_shards))
        stats = IndexStats(
            n_docs=n_docs, avgdl=avgdl, shard_span=shard_span,
            num_shards=num_shards, n_buckets=n_buckets,
            block_size=block_size, k1=k1, b=b,
        )
        write_stats(out_dir, stats)
        # doc_stats carries the shard key so the query side can cogroup
        # posting blocks with the doc-length array of the same doc_id
        # range (no per-doc join on the scoring path).
        (
            ds.withColumn(
                "shard", (F.col("doc_id") / F.lit(stats.shard_span)).cast("int")
            )
            .repartition("shard")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "doc_stats"))
        )
        _commit_checkpoint(spark, ckpt_dir, buckets=[-1])
        done.add(-1)

    ds = spark.read.parquet(os.path.join(out_dir, "doc_stats"))

    enriched = (
        tf.join(ds, "doc_id")
        .withColumn("shard", (F.col("doc_id") / F.lit(stats.shard_span)).cast("int"))
        .withColumn("bucket", _bucket_col(F.col("term"), stats.n_buckets))
    )

    encoder = _make_encoder(stats)
    waves = _bucket_waves(stats.n_buckets, n_waves)
    committed = 0
    for wave_id, bucket_range in enumerate(waves):
        todo = [bk for bk in bucket_range if bk not in done]
        if not todo:
            continue
        wave_df = enriched.where(F.col("bucket").isin(todo))
        blocks = wave_df.groupBy("term", "shard").applyInPandas(
            encoder, schema=POSTINGS_SCHEMA
        )
        (
            blocks.repartition("bucket", "term")
            .sortWithinPartitions("term", "shard", "block_id")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(postings_dir)
        )
        # lineage counters per bucket from the committed files
        # (column-pruned, partition-pruned scan of what just landed).
        per_bucket = {
            int(r["bucket"]): r
            for r in (
                spark.read.parquet(postings_dir)
                .where(F.col("bucket").isin(todo))
                .groupBy("bucket")
                .agg(
                    F.countDistinct("term").alias("terms"),
                    F.count("*").alias("blocks"),
                    F.sum("n_docs").alias("postings"),
                    F.sum("tf_sum").alias("tokens"),
                    (F.sum(F.length("doc_ids")) + F.sum(F.length("tfs"))).alias("bytes"),
                )
                .collect()
            )
        }
        _commit_checkpoint(spark, ckpt_dir, buckets=todo, per_bucket=per_bucket)
        committed += 1
        if fail_after_waves is not None and committed >= fail_after_waves:
            tf.unpersist()
            raise RuntimeError(f"injected failure after {committed} committed wave(s)")

    _write_lexicon(spark, out_dir, stats)
    tf.unpersist()
    return stats


def _bucket_waves(n_buckets: int, n_waves: int) -> list[list[int]]:
    n_waves = max(1, min(n_waves, n_buckets))
    per = -(-n_buckets // n_waves)
    return [list(range(i, min(i + per, n_buckets))) for i in range(0, n_buckets, per)]


_EMPTY_COUNTERS = {"terms": 0, "blocks": 0, "postings": 0, "tokens": 0, "bytes": 0}


def _commit_checkpoint(
    spark: SparkSession,
    ckpt_dir: str,
    buckets: Iterable[int],
    per_bucket: dict | None = None,
) -> None:
    per_bucket = per_bucket or {}
    rows = []
    for bk in buckets:
        c = per_bucket.get(int(bk), _EMPTY_COUNTERS)
        rows.append(
            (
                int(bk), "done",
                int(c["terms"]), int(c["blocks"]),
                int(c["postings"]), int(c["tokens"]), int(c["bytes"]),
            )
        )
    df = spark.createDataFrame(
        rows,
        "bucket int, status string, terms long, blocks long, "
        "postings long, tokens long, bytes long",
    ).withColumn("committed_at", F.current_timestamp())
    df.coalesce(1).write.mode("append").parquet(ckpt_dir)


def _write_lexicon(spark: SparkSession, out_dir: str, stats: IndexStats) -> None:
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    lex = (
        postings.groupBy("term", "bucket")
        .agg(F.sum("n_docs").alias("df"), F.count("*").alias("n_blocks"))
        .withColumn("idf", idf_col(stats.n_docs, F.col("df")))
    )
    lex.write.mode("overwrite").parquet(os.path.join(out_dir, "lexicon"))
