"""Index maintenance: tombstone deletes and physical vacuum.

The reference engine has no delete path at all — removing a document
means rebuilding the whole index (its index is a one-shot MapReduce
artifact, README.md:423-427, served from an in-memory map). Here the
lifecycle follows the standard segment-index design (Lucene's
liveDocs-then-merge):

* :func:`delete_docs` records doc_ids in a small ``tombstones``
  parquet under the index dir. Queries exclude tombstoned docs at
  serving time; BM25 statistics (idf, avgdl, n_docs) stay those of
  the original build until vacuum — stale-stats-until-merge is the
  standard trade, and it keeps a delete O(|delete set|), never a
  corpus-sized job.
* :func:`vacuum_index` physically rewrites the posting blocks without
  the deleted docs and recomputes every statistic (doc_stats, stats
  header, term_stats, lexicon, checkpoint counters), after which
  query results are identical to a fresh build over the surviving
  corpus (tested rank- and score-identical).

Scale notes: the vacuum ships the tombstone set to executors as a
sorted int64 broadcast (8 bytes/id — fine to tens of millions of
deletes; vacuum regularly so the set stays "deletes since last
vacuum", not "all deletes ever"). Block rewrite is embarrassingly
parallel (mapInPandas over posting rows, vectorized NumPy masking per
block); untouched blocks are passed through without re-encoding. The
rewritten tables land in ``<table>.vacuum`` staging dirs and are
swapped in with directory renames — single-writer maintenance, same
filesystem; on an object store you would write a new index generation
dir instead.
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import codec
from .index_build import (
    _POSTINGS_COLUMNS,
    POSTINGS_SCHEMA,
    _commit_checkpoint,
    _write_lexicon,
    write_stats,
)
from .query_exec import Index


def _tomb_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "tombstones")


def _swap_dir(tmp: str, dst: str) -> None:
    """Replace ``dst`` with ``tmp`` via renames (same filesystem)."""
    old = dst + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(dst):
        os.rename(dst, old)
    os.rename(tmp, dst)
    if os.path.exists(old):
        shutil.rmtree(old)


def delete_docs(index: Index, doc_ids: DataFrame | Iterable[int]) -> int:
    """Tombstone ``doc_ids`` in the index. Returns the total tombstone
    count after the merge. O(|tombstones|) — no corpus or postings
    scan; queries on this Index exclude the set immediately."""
    spark = index.spark
    if isinstance(doc_ids, DataFrame):
        new = doc_ids.select(F.col("doc_id").cast("long"))
    else:
        ids = np.fromiter((int(i) for i in doc_ids), dtype=np.int64)
        new = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    d = _tomb_dir(index.out_dir)
    if os.path.exists(d):
        # parquet can't be overwritten while the plan still reads it:
        # stage the merged set next to it and swap directories.
        merged = spark.read.parquet(d).unionByName(new).distinct()
        tmp = d + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        _swap_dir(tmp, d)
    else:
        new.distinct().coalesce(1).write.mode("overwrite").parquet(d)
    index._tomb = None
    total = int(spark.read.parquet(d).count())
    return total


def _make_vacuum_rewriter(positions: bool, tomb_bc):
    """mapInPandas rewriter: drop tombstoned doc_ids from every posting
    block. Blocks untouched by the delete set pass through with their
    original encoded bytes; touched blocks are decoded, masked with one
    vectorized ``np.isin``, and re-encoded. ``min_dl`` is kept as-is:
    the stored minimum is over a superset of the surviving docs, so the
    derived block-max WAND bound stays a valid (merely less tight)
    upper bound until the next full build tightens it.
    """

    def rewrite(batches):
        tomb = tomb_bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            rows: list = []
            for row in pdf.itertuples(index=False):
                ids = codec.decode_doc_ids(
                    bytes(row.doc_ids), n=int(row.n_docs),
                    base=int(row.first_doc_id),
                )
                mask = np.isin(ids, tomb, invert=True, assume_unique=True)
                if mask.all():
                    rows.append(tuple(row))
                    continue
                if not mask.any():
                    continue
                tfs = codec.decode_tfs(bytes(row.tfs), n=int(row.n_docs))
                kept = ids[mask]
                kept_tf = tfs[mask]
                enc_d = codec.encode_doc_ids(kept, base=int(kept[0]))
                enc_t = codec.encode_tfs(kept_tf)
                if positions and row.positions is not None:
                    pos = codec.decode_positions(bytes(row.positions), tfs)
                    occ_mask = np.repeat(mask, tfs)
                    enc_p = codec.encode_positions(pos[occ_mask], kept_tf)
                else:
                    enc_p = None
                rows.append(
                    (
                        int(row.term_hash), int(row.shard),
                        int(row.block_id), int(kept[0]), enc_d, enc_t,
                        int(kept.shape[0]), int(kept_tf.sum()),
                        len(enc_d) + len(enc_t)
                        + (len(enc_p) if enc_p else 0),
                        int(kept_tf.max()), int(row.min_dl), enc_p,
                        int(row.bucket),
                    )
                )
            if rows:
                yield pd.DataFrame(rows, columns=_POSTINGS_COLUMNS)

    return rewrite


def vacuum_index(index: Index) -> Index:
    """Physically purge tombstoned docs: rewrite posting blocks and
    doc_stats without them, recompute n_docs/avgdl/df/idf and the
    per-bucket lineage counters, drop the tombstone set, and return the
    reloaded Index. After vacuum, queries are rank- and score-identical
    to a fresh :func:`~.index_build.build_index` over the surviving
    corpus (by test) — deleted docs no longer dilute idf/avgdl the way
    they do during the tombstone phase."""
    spark = index.spark
    out_dir = index.out_dir
    stats = index.stats
    tomb = index.tombstone_array()
    if tomb is None:
        return index
    tomb_bc = spark.sparkContext.broadcast(np.sort(np.unique(tomb)))

    # 1. posting blocks: decode -> mask -> re-encode, original layout
    postings_dir = os.path.join(out_dir, "postings")
    tmp_postings = postings_dir + ".vacuum"
    rewriter = _make_vacuum_rewriter(bool(stats.positions), tomb_bc)
    (
        # column order pinned to the schema: the rewriter's fast path
        # passes untouched rows through positionally
        spark.read.parquet(postings_dir)
        .select(*_POSTINGS_COLUMNS)
        .mapInPandas(rewriter, schema=POSTINGS_SCHEMA)
        .repartition("bucket", "term_hash")
        .sortWithinPartitions("term_hash", "shard", "block_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp_postings)
    )

    # 2. doc_stats minus tombstones (same partitionBy(shard) layout)
    ds_dir = os.path.join(out_dir, "doc_stats")
    tmp_ds = ds_dir + ".vacuum"
    tomb_df = spark.read.parquet(_tomb_dir(out_dir))
    (
        spark.read.parquet(ds_dir)
        .join(F.broadcast(tomb_df), "doc_id", "left_anti")
        .repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tmp_ds)
    )

    _swap_dir(tmp_postings, postings_dir)
    _swap_dir(tmp_ds, ds_dir)

    # 3. corpus statistics from the surviving docs (doc_len >= 1 only,
    # matching build_index's oracle-aligned semantics)
    row = (
        spark.read.parquet(ds_dir)
        .where(F.col("doc_len") >= 1)
        .agg(F.count("*").alias("n"), F.avg("doc_len").alias("avgdl"))
        .collect()[0]
    )
    new_stats = type(stats)(
        **{
            **stats.__dict__,
            "n_docs": int(row["n"]),
            "avgdl": float(row["avgdl"] or 0.0),
        }
    )
    write_stats(out_dir, new_stats)

    # 4. term_stats + checkpoint counters + lexicon, all from ONE
    # metadata-column scan of the rewritten postings (binary columns
    # pruned away) — the same derivation chain the build uses.
    term_stats_dir = os.path.join(out_dir, "term_stats")
    stats_df = (
        spark.read.parquet(postings_dir)
        .groupBy("term_hash", "bucket")
        .agg(
            F.sum("n_docs").alias("df"),
            F.count("*").alias("n_blocks"),
            F.sum("tf_sum").alias("tokens"),
            F.sum("n_bytes").alias("bytes"),
        )
        .persist()
    )
    tmp_ts = term_stats_dir + ".vacuum"
    (
        stats_df.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp_ts)
    )
    per_bucket = {
        int(r["bucket"]): r
        for r in (
            stats_df.groupBy("bucket")
            .agg(
                F.count("*").alias("terms"),
                F.sum("n_blocks").alias("blocks"),
                F.sum("df").alias("postings"),
                F.sum("tokens").alias("tokens"),
                F.sum("bytes").alias("bytes"),
            )
            .collect()
        )
    }
    stats_df.unpersist()
    _swap_dir(tmp_ts, term_stats_dir)

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    if os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    # every original bucket is re-marked done (a bucket whose terms all
    # vanished still must not look resumable), plus the -1 completion row
    _commit_checkpoint(
        spark, ckpt_dir,
        buckets=[-1] + list(range(stats.n_buckets)),
        per_bucket=per_bucket,
    )

    _write_lexicon(spark, out_dir, new_stats)

    shutil.rmtree(_tomb_dir(out_dir))
    tomb_bc.unpersist()
    return Index.load(spark, out_dir)
