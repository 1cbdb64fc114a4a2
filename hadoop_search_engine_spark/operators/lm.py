"""Corpus n-gram language model: training, perplexity scoring, and the
"did you mean" phrase suggester built on it.

Three training-pipeline / search-serving capabilities the reference
(term-frequency ranking only) has no analog for, but which every
web-scale corpus pipeline and search box ships:

* :func:`train_lm` — distributed unigram + bigram count tables over a
  corpus (one tokenize pass, two partial-aggregated groupBys). The
  CCNet pattern trains this on a small REFERENCE corpus (Wikipedia)
  and scores the crawl with it, which makes both count tables
  broadcastable at serving time; training on the crawl itself is the
  same plan at tokens scale.
* :func:`doc_perplexity` / :func:`perplexity_filter` — per-document
  perplexity under a Stupid-Backoff bigram LM (Brants et al. 2007, the
  web-scale smoothing: no discount bookkeeping, one backoff constant),
  the CCNet/RefinedWeb quality signal ("gibberish scores high, clean
  prose scores low"); the filter keeps a [min_ppl, max_ppl] band,
  mirroring CCNet's head/middle/tail percentile cut.
* :func:`suggest_phrase` — multi-token spell correction (the ES
  ``phrase`` suggester / "did you mean"): per-token candidates within
  ``max_edits`` of the vocabulary, scored as a noisy channel — bigram
  LM probability of the corrected sequence × an error penalty per edit
  — with an exact k-best Viterbi over the (tiny) candidate lattice.

**Cross-engine exactness.** Distributed float summation is
order-dependent, so per-token log-probabilities are QUANTIZED to
integer micro-nats (``round(ln(p) * 1e6)`` as int64) before any sum —
sums are then exact and order-free, and every score replays
bit-identically in DuckDB SQL (the same trick as the fixed-point
PageRank in operators/graph.py). The doubles fed to ``ln`` are
ratios/products of int64 counts, whose IEEE arithmetic is identical in
both engines; a last-ulp ``ln`` discrepancy would have to land within
~1e-8 of a rounding boundary to flip a quantized value.

Model (all counts from the training corpus; N = total tokens,
V = distinct terms):

* unigram  ``p(w)   = (c(w) + 1) / (N + V + 1)``  (add-one; OOV gets
  the unseen mass ``1 / (N + V + 1)``)
* bigram   ``S(w|v) = c(v w) / c(v)``        if ``c(v w) > 0``
           ``S(w|v) = 0.4 * p(w)``           otherwise (Stupid Backoff)
* first token of a document/query scores ``p(w)``.
* per-token cost ``llq = round(ln(S) * 1e6)`` (int64 micro-nats);
  ``ppl(doc) = exp(-sum(llq) / 1e6 / n_tokens)``.

Scale shape: training is two map-side-combinable groupBys (unigrams
are vocab-sized; bigrams are distinct-pair-sized). Scoring explodes
``(w, w_prev)`` pairs from zipped shifted slices — map-only, no window,
no shuffle-per-doc — then joins the count tables: unigrams broadcast
(vocab-sized), bigrams as a shuffle hash join on (w_prev, w) when
trained on the full crawl (tokens-scale, the same class as the index
build's event shuffle; AQE's skew join splits the "of the" key) or
broadcast when trained on a reference corpus. The final per-doc
aggregate is a partial-aggregated int64 sum.

No reference analog (the closest surface is the client-side fuzzy
rewrite, /root/reference/client/src/utils/searchProcessor.ts) — this
module exists for the LLM-training-pipeline mandate and the ES
``phrase`` suggester parity.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens_col, tokenize

# Quantization scale: micro-nats. One part in 1e6 of a nat is far below
# any meaningful LM score difference and far above double-ulp noise.
LLQ_SCALE = 1_000_000
# Stupid Backoff constant (Brants et al. 2007 use 0.4).
BACKOFF = 0.4
# Noisy-channel cost per edit for the phrase suggester: P(edit) = 0.1.
EDIT_LLQ = int(round(math.log(0.1) * LLQ_SCALE))


def train_lm(
    docs: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Unigram and bigram count tables: ``(term, count)`` and
    ``(w_prev, w, count)``. One tokenize pass feeds both (the token
    array is materialized once through a struct projection — Spark's
    subexpression elimination does not reach through higher-order
    expressions, see operators/text_analysis.py:_ngrams_col); each
    aggregate is map-side combinable, so the shuffle carries one row
    per distinct (partition, key), not per occurrence."""
    toks = docs.select(tokens_col(F.col(text_col)).alias("t"))
    unigrams = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("count"))
    )
    span = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice("t", 1, span).alias("w_prev"),
        F.slice("t", 2, span).alias("w"),
    )
    bigrams = (
        toks.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w_prev").alias("w_prev"), F.col("p.w").alias("w"))
        .groupBy("w_prev", "w")
        .agg(F.count("*").alias("count"))
    )
    return unigrams, bigrams


def write_lm(unigrams: DataFrame, bigrams: DataFrame, out_dir: str) -> None:
    """Persist an LM as parquet (``unigrams/``, ``bigrams/``) — the
    reference-corpus artifact a CCNet-style pipeline trains once and
    reuses across crawl snapshots."""
    unigrams.write.mode("overwrite").parquet(os.path.join(out_dir, "unigrams"))
    bigrams.write.mode("overwrite").parquet(os.path.join(out_dir, "bigrams"))


def read_lm(spark: SparkSession, lm_dir: str) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(os.path.join(lm_dir, "unigrams")),
        spark.read.parquet(os.path.join(lm_dir, "bigrams")),
    )


def _lm_totals(unigrams: DataFrame) -> DataFrame:
    """1-row (n_tokens, vocab) aggregate — broadcast-crossJoined into
    the scoring plan so everything stays one lazy plan."""
    return unigrams.agg(
        F.sum("count").alias("lm_n"), F.count("*").alias("lm_v")
    )


def _token_llq(c_w, c_prev, c_big, is_first, lm_n, lm_v):
    """Quantized per-token Stupid-Backoff log-probability (micro-nats,
    int64). The double handed to ``ln`` is built from int64 counts by
    IEEE-exact ops only (one divide, optionally one multiply), so both
    engines quantize the same value."""
    p_uni = (c_w + F.lit(1)).cast("double") / (lm_n + lm_v + F.lit(1)).cast("double")
    bigram = F.log(c_big.cast("double") / c_prev.cast("double"))
    uni = F.log(p_uni)
    backoff = F.log(F.lit(BACKOFF) * p_uni)
    ln_s = (
        F.when(is_first, uni)
        .when((c_big > 0) & (c_prev > 0), bigram)
        .otherwise(backoff)
    )
    return F.round(ln_s * F.lit(LLQ_SCALE)).cast("long")


def _scored_tokens(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-token quantized costs: (id, llq). ``(w, w_prev)`` pairs come
    from zipping the token array with its 1-shifted self — map-only,
    no window/sort — then three count joins (unigrams broadcast; the
    bigram join's strategy is left to the planner/AQE: broadcast for a
    reference-corpus LM, shuffle hash join with skew splitting for a
    crawl-trained one)."""
    toks = tokens_col(F.col(text_col))
    n = F.size("t")
    zipped = F.arrays_zip(
        F.col("t").alias("w"),
        F.concat(F.array(F.lit(None).cast("string")),
                 F.slice("t", 1, F.greatest(n - 1, F.lit(0)))).alias("w_prev"),
    )
    tok = (
        docs.select(F.col(id_col).alias("_id"), toks.alias("t"))
        .select("_id", F.explode(zipped).alias("p"))
        # a token-less doc zips [] with the 1-element [null] prefix and
        # arrays_zip pads to the longest — drop that phantom element
        .where(F.col("p.w").isNotNull())
        .select("_id", F.col("p.w").alias("w"), F.col("p.w_prev").alias("w_prev"))
    )
    uni_w = F.broadcast(unigrams.select(F.col("term").alias("w"),
                                        F.col("count").alias("c_w")))
    uni_p = F.broadcast(unigrams.select(F.col("term").alias("w_prev"),
                                        F.col("count").alias("c_prev")))
    big = bigrams.select("w_prev", "w", F.col("count").alias("c_big"))
    scored = (
        tok.join(uni_w, "w", "left")
        .join(uni_p, "w_prev", "left")
        .join(big, ["w_prev", "w"], "left")
        .crossJoin(F.broadcast(_lm_totals(unigrams)))
    )
    llq = _token_llq(
        F.coalesce("c_w", F.lit(0)),
        F.coalesce("c_prev", F.lit(0)),
        F.coalesce("c_big", F.lit(0)),
        F.col("w_prev").isNull(),
        F.col("lm_n"),
        F.col("lm_v"),
    )
    return scored.select(F.col("_id"), llq.alias("llq"))


def doc_perplexity(
    docs: DataFrame,
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under the (possibly external) LM:
    ``(id_col, n_tokens, sum_llq, ppl)``. With no LM given the corpus
    scores itself (self-perplexity — the repetition/templatedness
    signal). Token-less docs keep a row with ``n_tokens = 0`` and
    ``ppl = 0.0`` (nothing to judge — the filter passes them).
    ``sum_llq`` is the exact int64 micro-nat sum; ``ppl`` derives from
    it by two IEEE-exact divides and one ``exp``, so it is
    engine-identical too."""
    if unigrams is None:
        unigrams, bigrams = train_lm(docs, text_col)
    per_doc = (
        _scored_tokens(docs, unigrams, bigrams, text_col, id_col)
        .groupBy("_id")
        .agg(F.sum("llq").alias("sum_llq"), F.count("*").alias("n_tokens"))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_llq", F.lit(0)).cast("long").alias("sum_llq"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.exp(-(F.col("sum_llq").cast("double") / F.lit(float(LLQ_SCALE)))
                      / F.col("n_tokens").cast("double")),
            ).otherwise(F.lit(0.0)).alias("ppl"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    max_ppl: float,
    min_ppl: float = 0.0,
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity band filter: keep docs whose LM
    perplexity lies in ``[min_ppl, max_ppl]`` (both head — suspiciously
    compressible boilerplate — and tail — gibberish — can be cut).
    Token-less docs always pass. All original columns preserved."""
    ppl = doc_perplexity(docs, unigrams, bigrams, text_col, id_col)
    keep = ppl.where(
        (F.col("n_tokens") == 0)
        | ((F.col("ppl") >= float(min_ppl)) & (F.col("ppl") <= float(max_ppl)))
    ).select(F.col(id_col))
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Phrase suggester ("did you mean")
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class _Cand:
    term: str
    dist: int
    count: int


def _candidates(
    spark: SparkSession,
    q_tokens: list[str],
    unigrams: DataFrame,
    max_edits: int,
    per_token: int,
) -> list[list[_Cand]]:
    """Per-position candidate sets: vocabulary terms within
    ``max_edits`` Levenshtein edits, ranked (dist asc, count desc, term
    asc), capped at ``per_token`` — the MultiTermQuery-style rewrite
    order shared with fuzzy/prefix expansion. ONE vocab-sized JVM pass
    scores every position (positions broadcast against the unigram
    table); only ≤ positions × per_token rows reach the driver."""
    pos_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(q_tokens)], "pos int, tok string"
    )
    cand = (
        unigrams.crossJoin(F.broadcast(pos_df))
        .withColumn("dist", F.levenshtein(F.col("term"), F.col("tok")))
        .where(F.col("dist") <= max_edits)
        .select("pos", "term", "dist", "count")
    )
    from pyspark.sql import Window
    w = Window.partitionBy("pos").orderBy(
        F.col("dist").asc(), F.col("count").desc(), F.col("term").asc()
    )
    rows = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_token)
        .collect()
    )
    out: list[list[_Cand]] = [[] for _ in q_tokens]
    for r in rows:
        out[r["pos"]].append(_Cand(r["term"], int(r["dist"]), int(r["count"])))
    for c in out:
        c.sort(key=lambda e: (e.dist, -e.count, e.term))
    return out


def suggest_phrase(
    spark: SparkSession,
    query: str,
    unigrams: DataFrame,
    bigrams: DataFrame,
    max_edits: int = 1,
    per_token: int = 5,
    topn: int = 3,
) -> DataFrame:
    """ES ``phrase`` suggester: top-``topn`` whole-query corrections as
    ``(suggestion, score)``, score = Σ per-token quantized
    Stupid-Backoff log-prob (same model as :func:`doc_perplexity`,
    first token unigram) + ``dist × ln(0.1)`` noisy-channel penalty per
    token, in nats. Exact k-best Viterbi over the candidate lattice
    (per-state top-``topn`` partial paths — the lattice is
    per_token × len(query) small, so this is driver-side arithmetic on
    k-row data, not a Spark job). Ties break on suggestion text asc;
    score is an exact int64 micro-nat sum divided once, so it replays
    bit-identically in SQL. A query with no in-range candidates at some
    position yields zero rows (ES returns no suggestion then)."""
    q_tokens = tokenize(query)
    if not q_tokens:
        return spark.createDataFrame([], "suggestion string, score double")
    cands = _candidates(spark, q_tokens, unigrams, max_edits, per_token)
    if any(not c for c in cands):
        return spark.createDataFrame([], "suggestion string, score double")

    totals = _lm_totals(unigrams).collect()[0]
    lm_n, lm_v = int(totals["lm_n"]), int(totals["lm_v"])
    uni_terms = {c.term for pos in cands for c in pos}
    big_pairs: dict[tuple[str, str], int] = {}
    if len(q_tokens) > 1:
        pair_rows = []
        for i in range(len(q_tokens) - 1):
            for a in cands[i]:
                for b in cands[i + 1]:
                    pair_rows.append((a.term, b.term))
        pairs_df = spark.createDataFrame(
            sorted(set(pair_rows)), "w_prev string, w string"
        )
        got = bigrams.join(F.broadcast(pairs_df), ["w_prev", "w"]).collect()
        big_pairs = {(r["w_prev"], r["w"]): int(r["count"]) for r in got}
    uni_counts = {c.term: c.count for pos in cands for c in pos}
    assert uni_terms == set(uni_counts)

    def uni_llq(term: str) -> int:
        p = (uni_counts[term] + 1) / (lm_n + lm_v + 1)
        return int(round(math.log(p) * LLQ_SCALE))

    def step_llq(prev: str, term: str) -> int:
        cb = big_pairs.get((prev, term), 0)
        if cb > 0:
            return int(round(math.log(cb / uni_counts[prev]) * LLQ_SCALE))
        p = (uni_counts[term] + 1) / (lm_n + lm_v + 1)
        return int(round(math.log(BACKOFF * p) * LLQ_SCALE))

    # k-best Viterbi: per lattice state, the top-n (score, phrase) partials.
    beams: list[dict[str, list[tuple[int, str]]]] = []
    first: dict[str, list[tuple[int, str]]] = {}
    for c in cands[0]:
        s = uni_llq(c.term) + c.dist * EDIT_LLQ
        first.setdefault(c.term, []).append((s, c.term))
    beams.append(first)
    for i in range(1, len(q_tokens)):
        nxt: dict[str, list[tuple[int, str]]] = {}
        for c in cands[i]:
            paths: list[tuple[int, str]] = []
            for prev_term, prev_paths in beams[-1].items():
                e = step_llq(prev_term, c.term) + c.dist * EDIT_LLQ
                for ps, ptext in prev_paths:
                    paths.append((ps + e, ptext + " " + c.term))
            paths.sort(key=lambda t: (-t[0], t[1]))
            nxt[c.term] = paths[:topn]
        beams.append(nxt)
    final = [p for paths in beams[-1].values() for p in paths]
    final.sort(key=lambda t: (-t[0], t[1]))
    rows = [(text, sq / LLQ_SCALE) for sq, text in final[:topn]]
    return spark.createDataFrame(rows, "suggestion string, score double")
