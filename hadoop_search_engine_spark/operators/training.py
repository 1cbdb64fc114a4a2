"""Training-sequence assembly: chunking and sequence packing.

The two shape operations between a curated corpus and a training
batch, absent from the forward-only reference (its pipeline ends at
the index — README.md:423-427 — where an LLM-data pipeline continues
into fixed-length rows):

* :func:`chunk_docs` — sliding token windows over each document
  (RAG / context-window prep; Lucene has no analog, the ES
  ingest-pipeline equivalent is a script processor). Map-only: the
  explode multiplies rows beside the scan, nothing shuffles.
* :func:`pack_spans` / :func:`pack_text` — GPT-style concat-and-split
  packing: documents concatenated in ``id_col`` order and split every
  ``seq_len`` tokens, documents spanning row boundaries (Brown et al.
  2020 §2.2's batch shape). ``pack_spans`` returns the (doc, bin)
  token-range MAPPING — the audit/lineage table; ``pack_text``
  materializes the packed rows themselves.

Determinism contract: packing is a pure function of (doc_id order,
token counts, seq_len) — exact integer arithmetic end to end (one
exclusive cumulative sum + floor divisions), so the layout is
identical across partitionings, reruns, and engines; the DuckDB
oracle replays it verbatim.

Scale shape: the exclusive cumulative sum never serializes — by
default it runs bucketed (:func:`_exclusive_cumsum`): docs land in
``cumsum_buckets`` deterministic id-value ranges, per-bucket token
totals fold into offsets over a tiny (groups x buckets) frame, and
the per-doc window runs per (group, bucket), so every task is bounded
by a bucket even when one group — or the ungrouped whole corpus —
dominates. ``pack_text`` additionally shuffles each bin's token
slices once — inherent, packing is a data reorganization — with
bin_id keys, never whole documents, as the shuffle payload alongside
the slices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens_col

__all__ = ["chunk_docs", "pack_spans", "pack_text"]


def chunk_docs(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token windows: ``(doc_id, chunk_id, n_tokens,
    chunk_text)``, chunk ``i`` covering tokens
    ``[i*step, i*step + max_tokens)`` with ``step = max_tokens -
    overlap``. The last chunk is short rather than padded; a doc of
    ``n <= max_tokens`` tokens yields exactly one chunk; empty docs
    yield none. ``n_chunks = max(ceil((n - overlap) / step), 1)`` —
    every token belongs to >= 1 chunk and no chunk starts past the
    text. JVM expressions only (tokenize once through an inner
    projection, then sequence+transform+explode): map-only, fuses
    with the scan."""
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    step = max_tokens - overlap
    inner = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    n_chunks = F.greatest(
        F.floor((n - overlap + step - 1) / step).cast("int"), F.lit(1)
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.slice(F.col("_toks"), i * step + 1, max_tokens).alias(
                    "_sl"
                ),
            ),
        )
    )
    return (
        inner.where(n > 0)
        .select(id_col, chunk.alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.size("_c._sl").alias("n_tokens"),
            F.array_join("_c._sl", " ").alias("chunk_text"),
        )
    )


def _exclusive_cumsum(
    inner: DataFrame,
    keys: list[str],
    id_col: str,
    cumsum_buckets: int | None,
) -> DataFrame:
    """Exact exclusive running sum of ``_n`` in ``id_col`` order
    (within ``keys`` groups) as column ``_g``.

    ``cumsum_buckets=None`` is the textbook window — which serializes
    each group (or, ungrouped, the WHOLE corpus) into one task. The
    default bucketed path is identical arithmetic but parallel: docs
    land in ``cumsum_buckets`` deterministic id-value ranges, a
    vocab-free aggregation yields per-bucket token totals, a window
    over that TINY frame (<= groups x buckets rows) folds them into
    per-bucket offsets, and the per-doc window runs per (group,
    bucket) — every task bounded by a bucket, never a group. The
    bucketing is a pure function of the id values (no sampling, no
    ``repartitionByRange`` nondeterminism), so the result is
    partition-invariant and identical to the window path."""
    if not cumsum_buckets:
        w = (
            Window.partitionBy(*keys)
            if keys
            else Window.partitionBy(F.lit(0))
        ).orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        return inner.withColumn(
            "_g", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
        )
    lo, hi = inner.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return inner.withColumn("_g", F.lit(0).cast("long"))
    width = max((int(hi) - int(lo)) // int(cumsum_buckets) + 1, 1)
    bucketed = inner.withColumn(
        "_b", F.expr(f"({id_col} - {int(lo)}) DIV {width}")
    )
    woff = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(0))
    ).orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        bucketed.groupBy(*keys, "_b")
        .agg(F.sum("_n").alias("_bt"))
        .select(
            *keys,
            "_b",
            F.coalesce(F.sum("_bt").over(woff), F.lit(0))
            .cast("long")
            .alias("_off"),
        )
    )
    wloc = (
        Window.partitionBy(*keys, "_b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offs), [*keys, "_b"])
        .withColumn(
            "_g",
            (
                F.coalesce(F.sum("_n").over(wloc), F.lit(0)) + F.col("_off")
            ).cast("long"),
        )
        .drop("_b", "_off")
    )


def _spans(
    docs: DataFrame,
    seq_len: int,
    group_col: str | None,
    text_col: str,
    id_col: str,
    carry_tokens: bool,
    cumsum_buckets: int | None,
) -> tuple[DataFrame, list[str]]:
    """Shared packing arithmetic: per doc the exclusive running token
    total ``g`` (within its group, in id order), exploded to one row
    per training bin the doc's tokens land in. 0-based token offsets,
    ``tok_end`` exclusive; empty docs vanish (they occupy no tokens)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = int(seq_len)
    keys = [group_col] if group_col else []
    cols = [F.col(c) for c in (*keys, id_col)]
    inner = docs.select(
        *cols, tokens_col(F.col(text_col)).alias("_toks")
    ).select(*cols, F.col("_toks"), F.size("_toks").alias("_n"))
    summed = _exclusive_cumsum(
        inner.where(F.col("_n") > 0), keys, id_col, cumsum_buckets
    )
    staged = summed.select(
        *cols,
        F.col("_n").cast("long").alias("_n"),
        F.col("_g"),
        *([F.col("_toks")] if carry_tokens else []),
    )
    bin_id = F.explode(
        F.sequence(
            F.floor(F.col("_g") / L).cast("long"),
            F.floor((F.col("_g") + F.col("_n") - 1) / L).cast("long"),
        )
    ).alias("bin_id")
    spans = staged.select("*", bin_id).select(
        *keys,
        id_col,
        "bin_id",
        F.greatest(F.col("_g") - F.col("bin_id") * L, F.lit(0))
        .cast("long")
        .alias("bin_pos"),
        F.greatest(F.col("bin_id") * L - F.col("_g"), F.lit(0))
        .cast("long")
        .alias("tok_start"),
        F.least((F.col("bin_id") + 1) * L - F.col("_g"), F.col("_n"))
        .cast("long")
        .alias("tok_end"),
        *([F.col("_toks")] if carry_tokens else []),
    )
    return spans, keys


def pack_spans(
    docs: DataFrame,
    seq_len: int,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cumsum_buckets: int | None = 1024,
) -> DataFrame:
    """The (doc, bin) token-range mapping of concat-and-split packing:
    one row per training bin each doc's tokens land in —
    ``(group?, doc_id, bin_id, bin_pos, tok_start, tok_end)`` where
    ``[tok_start, tok_end)`` are the doc's 0-based token offsets in
    that bin and ``bin_pos`` is where they start inside the bin. A doc
    longer than ``seq_len`` spans several bins; the final bin per
    group is partial. This is the lineage table ("which document bytes
    trained in which row") and the input to :func:`pack_text`."""
    spans, keys = _spans(
        docs, seq_len, group_col, text_col, id_col,
        carry_tokens=False, cumsum_buckets=cumsum_buckets,
    )
    return spans.select(
        *keys, id_col, "bin_id", "bin_pos", "tok_start", "tok_end"
    )


def pack_text(
    docs: DataFrame,
    seq_len: int,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cumsum_buckets: int | None = 1024,
) -> DataFrame:
    """Materialized packed training rows: ``(group?, bin_id, n_tokens,
    text)`` — every bin holds exactly ``seq_len`` tokens except the
    final partial bin per group; ``text`` is the space-joined token
    stream in concatenation order (doc boundaries are NOT marked —
    emit a sentinel token in ``text_col`` upstream if the recipe wants
    one). One shuffle of token slices keyed by bin."""
    spans, keys = _spans(
        docs, seq_len, group_col, text_col, id_col,
        carry_tokens=True, cumsum_buckets=cumsum_buckets,
    )
    piece = F.slice(
        F.col("_toks"),
        (F.col("tok_start") + 1).cast("int"),
        (F.col("tok_end") - F.col("tok_start")).cast("int"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("bin_pos", "_piece"))),
        lambda s: s._piece,
    )
    assembled = (
        spans.select(*keys, "bin_id", "bin_pos", piece.alias("_piece"))
        .groupBy(*keys, "bin_id")
        .agg(F.flatten(ordered).alias("_toks"))
    )
    return assembled.select(
        *keys,
        "bin_id",
        F.size("_toks").alias("n_tokens"),
        F.array_join("_toks", " ").alias("text"),
    )


def pack_manifest(
    docs: DataFrame,
    seq_len: int,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cumsum_buckets: int | None = 1024,
) -> DataFrame:
    """Per-bin ATTENTION-BOUNDARY metadata for packed training rows:
    ``(group?, bin_id, n_tokens, doc_ids, doc_starts)`` where
    ``doc_starts[i]`` is the in-bin token position where
    ``doc_ids[i]``'s slice begins (``doc_starts[0]`` is 0 except in
    bins a doc spans into). This is exactly what a trainer needs to
    build the block-diagonal ("document masking") attention mask over
    :func:`pack_text` rows — tokens never attend across the doc
    boundaries listed here — and the two frames join on
    ``(group?, bin_id)`` by construction (same span arithmetic).

    Arrays are sorted by in-bin position; output is |bins| rows with
    per-row array length = docs-touching-that-bin (bounded by
    ``seq_len`` since empty docs vanish). One partial-aggregated
    groupBy over the span table — no token bytes move, unlike
    pack_text."""
    spans, keys = _spans(
        docs, seq_len, group_col, text_col, id_col,
        carry_tokens=False, cumsum_buckets=cumsum_buckets,
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("bin_pos", F.col(id_col).alias("_d")))
    )
    return (
        spans.groupBy(*keys, "bin_id")
        .agg(
            F.sum(F.col("tok_end") - F.col("tok_start"))
            .cast("long").alias("n_tokens"),
            F.transform(ordered, lambda s: s._d).alias("doc_ids"),
            F.transform(ordered, lambda s: s.bin_pos.cast("long"))
            .alias("doc_starts"),
        )
    )
