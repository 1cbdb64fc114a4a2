"""Byte-pair-encoding tokenizer-vocab induction over the corpus.

The missing link between the engine's curation stages and a training
run: learn the subword merge table FROM the data (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units"), then segment documents with it. The forward-only reference
stops at whole-word tokens (its tokenizer is a split+lower regex,
README.md:423-427); an LLM-data pipeline needs the induced subword
vocabulary itself.

Algorithm (classic word-level BPE): aggregate the corpus to a
``(word, count)`` table — vocab-sized, BOUNDED sublinearly in corpus
size (Heaps' law), which is what makes 100 TB training tractable:
every merge iteration touches the vocabulary, never the corpus. Each
word starts as its character sequence with ``</w>`` attached to the
final character; each iteration counts adjacent symbol pairs weighted
by word count, merges the most frequent pair (ties: count desc, then
(left, right) lexicographic — deterministic, unlike the reference
implementation's dict order), and rewrites the affected words.

Two identity-tested paths:

* **driver** — collect the word counts and run the textbook dict
  loop; right whenever the vocabulary fits on the driver (the common
  case: even web-scale corpora have vocabularies in the tens of
  millions).
* **spark** — the vocabulary stays distributed; pair counting is one
  partial-aggregated shuffle per iteration and the merge rewrite is a
  pure JVM ``aggregate`` fold (left-to-right non-overlapping — the
  fold cannot re-merge its own output because ``a+b`` never equals
  ``a``), gated by an ``exists`` pre-filter so untouched words don't
  re-serialize. ``localCheckpoint`` every few iterations keeps the
  plan from deepening (the standard Spark iterative-algorithm guard;
  on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
  reliable checkpoints for executor-loss safety).

Encoding (:func:`bpe_encode`) is per-word and memoized: an Arrow
pandas UDF tokenizes each batch, encodes each UNIQUE word once with
the broadcast rank table (repeatedly merging the lowest-rank adjacent
pair — the classic greedy segmenter), and maps the results back —
the Python cost is per distinct word per batch, not per token.

No SQL oracle: BPE training is inherently iterative (each merge
depends on the table rewritten by every previous merge), the class of
operator the driver contract records rows-only; correctness is pinned
by the driver==spark identity test, a hand-checked Sennrich-style
fixture, and the reconstruction invariant (concatenating a word's
subwords always rebuilds the word — segmentation never loses bytes).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import tokens_col

__all__ = [
    "word_counts",
    "bpe_train",
    "bpe_encode",
    "merge_word",
    "encode_word",
]

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — total occurrences per distinct token. One
    partial-aggregated shuffle; the output is vocabulary-sized."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _sym_init_col(word: Column) -> Column:
    """Character symbols with ``</w>`` attached to the final char."""
    chars = F.filter(F.split(word, ""), lambda s: s != "")
    return F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.get(chars, F.size(chars) - 1), F.lit(END))),
    )


def _pairs_col(syms: Column) -> Column:
    """Adjacent symbol pairs as an array of 2-field structs."""
    span = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.arrays_zip(F.slice(syms, 1, span), F.slice(syms, 2, span))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) — the
    JVM fold. Safe against self-overlap: once a pair merges, the new
    symbol is ``a+b`` which can never equal ``a`` (b is non-empty),
    so the fold's tail can't chain onto its own output."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _sym_init(word: str) -> tuple[str, ...]:
    return (*word[:-1], word[-1] + END)


def merge_word(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Python twin of :func:`_merge_fold` (identity-tested)."""
    ab = a + b
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = ab
        else:
            out.append(s)
    return tuple(out)


def _train_driver(
    vocab: dict[tuple[str, ...], int], n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, int]]:
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            ns = merge_word(syms, a, b)
            new[ns] = new.get(ns, 0) + c
        vocab = new
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    min_pair_count: int = 2,
    text_col: str = "text",
    mode: str = "auto",
    max_driver_vocab: int = 2_000_000,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """Learn the BPE merge table: ``(rank, left, right, pair_count)``
    in merge order. ``mode`` is ``"driver"`` / ``"spark"`` /
    ``"auto"`` (driver when the distinct-word count fits
    ``max_driver_vocab``). Both paths implement the identical
    deterministic contract and are identity-tested."""
    if mode not in ("auto", "driver", "spark"):
        raise ValueError(f"mode must be auto|driver|spark, got {mode}")
    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    if mode == "auto":
        mode = (
            "driver"
            if wc.limit(max_driver_vocab + 1).count() <= max_driver_vocab
            else "spark"
        )
    out_schema = (
        "rank int, left string, right string, pair_count long"
    )
    if mode == "driver":
        vocab = {
            _sym_init(r["word"]): r["cnt"]
            for r in wc.collect()
            if r["word"]
        }
        merges = _train_driver(vocab, n_merges, min_pair_count)
        return spark.createDataFrame(merges, out_schema)

    words = wc.where(F.col("word") != "").select(
        "cnt", _sym_init_col(F.col("word")).alias("syms")
    )
    words = words.localCheckpoint()
    merges = []
    since_ckpt = 0
    for rank in range(n_merges):
        pairs = (
            words.select(
                "cnt", F.explode(_pairs_col(F.col("syms"))).alias("p")
            )
            .groupBy(
                F.col("p").getField("0").alias("a"),
                F.col("p").getField("1").alias("b"),
            )
            .agg(F.sum("cnt").alias("pc"))
        )
        best = (
            pairs.orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pc"] < min_pair_count:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        merges.append((rank, a, b, pc))
        has = F.exists(
            _pairs_col(F.col("syms")),
            lambda p: (p.getField("0") == F.lit(a))
            & (p.getField("1") == F.lit(b)),
        )
        words = words.withColumn(
            "syms",
            F.when(has, _merge_fold(F.col("syms"), a, b)).otherwise(
                F.col("syms")
            ),
        )
        since_ckpt += 1
        if since_ckpt >= checkpoint_interval:
            words = words.localCheckpoint()
            since_ckpt = 0
    return spark.createDataFrame(merges, out_schema)


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy BPE segmentation: repeatedly merge the LOWEST-rank
    adjacent pair present (the classic encoder — merge order, not
    left-most order, decides)."""
    if not word:
        return ()
    syms = _sym_init(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair[0], best_pair[1])
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | Iterable[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document with a learned merge table:
    ``(id_col, bpe_tokens array<string>, n_bpe_tokens)``. Arrow
    pandas UDF; each batch encodes every distinct word once (memoized)
    and the rank table rides executor-side as a broadcast-sized dict.
    Reconstruction invariant: ``concat(subwords of w) == w + "</w>"``
    — tested; segmentation can shrink the token COUNT only toward the
    whole-word floor, never lose or invent bytes."""
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "left", "right").collect()
        rank_items = [((r["left"], r["right"]), int(r["rank"])) for r in rows]
    else:
        rank_items = [((m[1], m[2]), int(m[0])) for m in merges]
    ranks = dict(rank_items)
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(ranks)

    from ..functions.tokenizer import tokenize_series

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(texts: pd.Series) -> pd.Series:
        rk = bc.value
        memo: dict[str, tuple[str, ...]] = {}
        out = []
        for toks in tokenize_series(texts):
            row: list[str] = []
            for w in toks:
                enc = memo.get(w)
                if enc is None:
                    enc = encode_word(w, rk)
                    memo[w] = enc
                row.extend(enc)
            out.append(row)
        return pd.Series(out)

    return docs.select(
        F.col(id_col),
        seg(F.col(text_col)).alias("bpe_tokens"),
    ).select(
        id_col,
        "bpe_tokens",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
    )
