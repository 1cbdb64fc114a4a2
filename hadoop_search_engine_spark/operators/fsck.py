"""Index integrity verification (fsck).

At 100 TB an index is the product of many jobs — build waves, streaming
compactions, physical merges, vacuums, legacy ``part-r-*`` imports —
and silent damage (a truncated copy, a lost bucket directory, a
mixed-layout merge, bit rot in a blob) must be detectable without a
rebuild. The reference has no such tool: its index is a single text
file trusted blindly at server start (server/src/utils/index.js). Here
every stored quantity is *derivable* from another table, so
:func:`verify_index` recomputes the invariants distributed and
column-pruned (the binary posting blobs are read only by the bounded
decode sample):

  ``layout``      stats header readable; postings/lexicon/doc_stats
                  committed (``_SUCCESS``); exactly one ``done``
                  checkpoint row per bucket plus the phase-0 marker
  ``counters``    per-bucket lineage counters (terms/blocks/postings/
                  tokens/bytes) == aggregates recomputed from postings
                  metadata columns
  ``lexicon``     per-term df/n_blocks == postings rollup; bucket ==
                  pmod(term_hash, B); idf == idf(N, df); term_hash
                  collision-free
  ``blocks``      bucket == pmod(term_hash, B) on every row;
                  first_doc_id inside its shard's doc_id range;
                  block_id dense 0..n-1 per (term_hash, shard)
  ``doc_stats``   doc_id unique and inside its shard range; header
                  n_docs/avgdl == the doc_len >= 1 aggregate
  ``decode``      sampled full decode: doc_ids strictly increasing
                  from first_doc_id within the shard range; tf >= 1;
                  tf_sum/max_tf/n_docs/n_bytes match the blobs;
                  positions blob consistent with tf (positional
                  indexes) or absent (plain)
  ``tombstones``  unique, inside the doc_id range

Every check is a metadata scan or a bounded sample; only per-check
failure examples are collected to the driver.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.bm25 import idf_col
from .index_build import _POSTINGS_COLUMNS
from .query_exec import Index

_DECODE_REPORT_SCHEMA = "term_hash long, shard int, block_id int, err string"

MAX_EXAMPLES = 5


def _check(ok: bool, detail: str) -> dict:
    return {"ok": bool(ok), "detail": detail}


def _examples(rows: list, n: int = MAX_EXAMPLES) -> str:
    return "; ".join(str(tuple(r)) for r in rows[:n])


def _make_decode_checker(positions_expected: bool, span: int):
    """mapInPandas batch checker: emits ONE row per corrupt block (the
    healthy path emits nothing, so the sample's result is ~empty)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad: list[tuple] = []
            for row in pdf.itertuples(index=False):
                errs: list[str] = []
                try:
                    ids = codec.decode_doc_ids(
                        bytes(row.doc_ids), n=int(row.n_docs),
                        base=int(row.first_doc_id),
                    )
                    tfs = codec.decode_tfs(
                        bytes(row.tfs), n=int(row.n_docs)
                    )
                except Exception as exc:  # noqa: BLE001 - reported, not raised
                    bad.append((row.term_hash, row.shard, row.block_id,
                                f"blob decode raised: {exc!r}"))
                    continue
                if ids.shape[0] != int(row.n_docs):
                    errs.append(f"doc_ids decodes {ids.shape[0]} != "
                                f"n_docs {row.n_docs}")
                if ids.shape[0]:
                    if int(ids[0]) != int(row.first_doc_id):
                        errs.append("first decoded id != first_doc_id")
                    if ids.shape[0] > 1 and not bool(np.all(np.diff(ids) > 0)):
                        errs.append("doc_ids not strictly increasing")
                    lo, hi = int(row.shard) * span, (int(row.shard) + 1) * span
                    if int(ids[0]) < lo or int(ids[-1]) >= hi:
                        errs.append(f"doc_ids outside shard range [{lo},{hi})")
                if tfs.shape[0] != int(row.n_docs):
                    errs.append("tfs length != n_docs")
                elif tfs.shape[0]:
                    if int(tfs.min()) < 1:
                        errs.append("tf < 1")
                    if int(tfs.sum()) != int(row.tf_sum):
                        errs.append("sum(tfs) != tf_sum")
                    if int(tfs.max()) != int(row.max_tf):
                        errs.append("max(tfs) != max_tf")
                pos_blob = row.positions
                if positions_expected:
                    if pos_blob is None:
                        errs.append("positional index but positions blob null")
                    else:
                        try:
                            pos = codec.decode_positions(
                                bytes(pos_blob), counts=tfs
                            )
                            if pos.shape[0] != int(row.tf_sum):
                                errs.append("positions count != tf_sum")
                            elif pos.shape[0]:
                                # strictly increasing inside each doc's
                                # segment (segment starts exempt)
                                starts = np.zeros(pos.shape[0], dtype=bool)
                                starts[np.concatenate(
                                    [[0], np.cumsum(tfs)[:-1]]
                                )] = True
                                if not bool(
                                    np.all((np.diff(pos) > 0)
                                           | starts[1:])
                                ):
                                    errs.append(
                                        "positions not increasing in-doc"
                                    )
                        except Exception as exc:  # noqa: BLE001
                            errs.append(f"positions decode raised: {exc!r}")
                    expected_bytes = (
                        len(bytes(row.doc_ids)) + len(bytes(row.tfs))
                        + (len(bytes(pos_blob)) if pos_blob is not None else 0)
                    )
                else:
                    if pos_blob is not None:
                        errs.append("plain index but positions blob present")
                    expected_bytes = len(bytes(row.doc_ids)) + len(bytes(row.tfs))
                if expected_bytes != int(row.n_bytes):
                    errs.append(f"n_bytes {row.n_bytes} != blob bytes "
                                f"{expected_bytes}")
                if errs:
                    bad.append((row.term_hash, row.shard, row.block_id,
                                "; ".join(errs)))
            yield pd.DataFrame(
                bad, columns=["term_hash", "shard", "block_id", "err"]
            ).astype({"term_hash": "int64", "shard": "int32",
                      "block_id": "int32", "err": "object"})

    return run


def verify_index(index: Index, sample_fraction: float = 0.05) -> dict:
    """Run every integrity check; returns ``{"ok": bool, "checks":
    {name: {"ok", "detail"}}}``. ``sample_fraction`` bounds the decode
    check (1.0 = decode every block)."""
    spark = index.spark
    stats = index.stats
    checks: dict[str, dict] = {}
    span, nb = stats.shard_span, stats.n_buckets
    doc_limit = span * stats.num_shards

    # layout -----------------------------------------------------------
    missing = [
        t for t in ("postings", "lexicon", "doc_stats", "checkpoints")
        if not os.path.isdir(os.path.join(index.out_dir, t))
    ]
    ck = index.checkpoints
    per_bucket_rows = (
        ck.where(F.col("bucket") >= 0)
        .groupBy("bucket").agg(F.count("*").alias("n"),
                               F.sum(F.when(F.col("status") == "done", 1)
                                     .otherwise(0)).alias("n_done"))
        .where((F.col("n") != 1) | (F.col("n_done") != 1))
        .limit(MAX_EXAMPLES).collect()
    )
    phase0 = ck.where(F.col("bucket") == -1).count()
    layout_errs = []
    if missing:
        layout_errs.append(f"missing tables: {missing}")
    if per_bucket_rows:
        layout_errs.append(
            "buckets without exactly one done checkpoint row: "
            + _examples(per_bucket_rows)
        )
    if phase0 != 1:
        layout_errs.append(f"phase-0 marker rows: {phase0} (want 1)")
    checks["layout"] = _check(not layout_errs, "; ".join(layout_errs) or
                              f"{stats.n_buckets} buckets committed")

    postings = index.postings

    # counters ---------------------------------------------------------
    recomputed = (
        postings.groupBy("bucket")
        .agg(
            F.countDistinct("term_hash").alias("r_terms"),
            F.count("*").alias("r_blocks"),
            F.sum("n_docs").alias("r_postings"),
            F.sum("tf_sum").alias("r_tokens"),
            F.sum("n_bytes").alias("r_bytes"),
        )
    )
    declared = ck.where(F.col("bucket") >= 0).select(
        "bucket", "terms", "blocks", "postings", "tokens", "bytes"
    )
    joined = declared.join(recomputed, "bucket", "full_outer").select(
        "bucket",
        *[
            F.coalesce(F.col(a), F.lit(0)).alias(a)
            for a in ("terms", "blocks", "postings", "tokens", "bytes",
                      "r_terms", "r_blocks", "r_postings", "r_tokens",
                      "r_bytes")
        ],
    )
    bad_counters = joined.where(
        (F.col("terms") != F.col("r_terms"))
        | (F.col("blocks") != F.col("r_blocks"))
        | (F.col("postings") != F.col("r_postings"))
        | (F.col("tokens") != F.col("r_tokens"))
        | (F.col("bytes") != F.col("r_bytes"))
    ).limit(MAX_EXAMPLES).collect()
    checks["counters"] = _check(
        not bad_counters,
        ("lineage counters match recomputed postings aggregates"
         if not bad_counters
         else "checkpoint counters != postings: " + _examples(bad_counters)),
    )

    # lexicon ----------------------------------------------------------
    rollup = postings.groupBy("term_hash").agg(
        F.sum("n_docs").alias("r_df"), F.count("*").alias("r_blocks")
    )
    lex = index.lexicon
    lex_join = lex.join(rollup, "term_hash", "full_outer")
    bad_lex = lex_join.where(
        F.col("term").isNull()            # postings for no lexicon entry
        | F.col("r_df").isNull()          # lexicon entry with no postings
        | (F.col("df") != F.col("r_df"))
        | (F.col("n_blocks") != F.col("r_blocks"))
        | (F.col("bucket") != F.pmod(F.col("term_hash"), F.lit(nb)))
        | (F.abs(F.col("idf") - idf_col(stats.n_docs, F.col("df"))) > 1e-9)
    ).select("term_hash", "term").limit(MAX_EXAMPLES).collect()
    dup_hash = (
        lex.groupBy("term_hash").count().where(F.col("count") > 1)
        .limit(MAX_EXAMPLES).collect()
    )
    lex_errs = []
    if bad_lex:
        lex_errs.append("df/n_blocks/bucket/idf mismatches: "
                        + _examples(bad_lex))
    if dup_hash:
        lex_errs.append("term_hash collisions: " + _examples(dup_hash))
    checks["lexicon"] = _check(
        not lex_errs, "; ".join(lex_errs) or "lexicon == postings rollup"
    )

    # block layout keys --------------------------------------------------
    bad_keys = postings.where(
        (F.col("bucket") != F.pmod(F.col("term_hash"), F.lit(nb)))
        | (F.col("first_doc_id") < F.col("shard").cast("long") * span)
        | (F.col("first_doc_id") >= (F.col("shard") + 1).cast("long") * span)
    ).select("term_hash", "shard", "block_id").limit(MAX_EXAMPLES).collect()
    bad_blockid = (
        postings.groupBy("term_hash", "shard")
        .agg(F.count("*").alias("n"), F.min("block_id").alias("lo"),
             F.max("block_id").alias("hi"),
             F.countDistinct("block_id").alias("nd"))
        .where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
               | (F.col("nd") != F.col("n")))
        .limit(MAX_EXAMPLES).collect()
    )
    key_errs = []
    if bad_keys:
        key_errs.append("bucket/shard-range violations: "
                        + _examples(bad_keys))
    if bad_blockid:
        key_errs.append("non-dense block_id runs: " + _examples(bad_blockid))
    checks["blocks"] = _check(
        not key_errs, "; ".join(key_errs) or "block keys consistent"
    )

    # doc_stats ----------------------------------------------------------
    ds = index.doc_stats
    bad_ds = ds.where(
        (F.col("doc_id") < F.col("shard").cast("long") * span)
        | (F.col("doc_id") >= (F.col("shard") + 1).cast("long") * span)
        | (F.col("doc_id") < 0) | (F.col("doc_id") >= doc_limit)
    ).limit(MAX_EXAMPLES).collect()
    agg = ds.agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("nd"),
        F.count(F.when(F.col("doc_len") >= 1, 1)).alias("n1"),
        F.avg(F.when(F.col("doc_len") >= 1, F.col("doc_len"))).alias("avgdl"),
    ).collect()[0]
    ds_errs = []
    if bad_ds:
        ds_errs.append("doc_id out of shard range: " + _examples(bad_ds))
    if int(agg["n"]) != int(agg["nd"]):
        ds_errs.append(f"duplicate doc_ids: {agg['n']} rows, "
                       f"{agg['nd']} distinct")
    if int(agg["n1"]) != stats.n_docs:
        ds_errs.append(f"header n_docs {stats.n_docs} != doc_stats "
                       f"{agg['n1']}")
    if stats.n_docs and abs(float(agg["avgdl"] or 0.0) - stats.avgdl) > 1e-9:
        ds_errs.append(f"header avgdl {stats.avgdl} != doc_stats "
                       f"{agg['avgdl']}")
    checks["doc_stats"] = _check(
        not ds_errs, "; ".join(ds_errs) or
        f"{stats.n_docs} docs, avgdl {round(stats.avgdl, 3)}"
    )

    # sampled decode -----------------------------------------------------
    sampled = (
        postings if sample_fraction >= 1.0
        else postings.sample(fraction=sample_fraction, seed=7)
    )
    checker = _make_decode_checker(bool(stats.positions), span)
    bad_blocks = (
        sampled.select(*_POSTINGS_COLUMNS)
        .mapInPandas(checker, schema=_DECODE_REPORT_SCHEMA)
        .limit(MAX_EXAMPLES)
        .collect()
    )
    checks["decode"] = _check(
        not bad_blocks,
        ("sampled blocks decode clean"
         if not bad_blocks
         else "corrupt blocks: " + _examples(bad_blocks)),
    )

    # tombstones ---------------------------------------------------------
    tomb_dir = os.path.join(index.out_dir, "tombstones")
    if os.path.isdir(tomb_dir):
        t = index.tombstones.agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        ).collect()[0]
        t_errs = []
        if int(t["n"]) != int(t["nd"]):
            t_errs.append(f"duplicates: {t['n']} rows {t['nd']} distinct")
        if t["lo"] is not None and (int(t["lo"]) < 0
                                    or int(t["hi"]) >= doc_limit):
            t_errs.append(f"out of range: [{t['lo']}, {t['hi']}]")
        checks["tombstones"] = _check(
            not t_errs, "; ".join(t_errs) or f"{t['n']} tombstones"
        )
    else:
        checks["tombstones"] = _check(True, "no tombstone table")

    return {"ok": all(c["ok"] for c in checks.values()), "checks": checks}
