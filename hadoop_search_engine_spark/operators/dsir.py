"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-crawl documents that *look like* a target
corpus, the standard pretraining-data selection step between raw-crawl
curation and tokenization.

Method (the paper's hashed n-gram variant, the one that scales):

1. Featurize every document as a bag of HASHED n-grams — unigrams and
   bigrams, ``murmur3(gram) % n_features`` buckets (the fastText
   hashing trick; collisions are part of the model, not a bug).
2. Fit two bag-of-features distributions: ``p_target`` on the target
   corpus (Wikipedia/books/a curated seed) and ``p_raw`` on the raw
   crawl, each with add-one smoothing over the ``n_features`` buckets.
3. Each raw doc's importance log-weight is the log-likelihood ratio of
   its feature bag: ``sum_f c_doc[f] * (ln p_target[f] - ln p_raw[f])``.
4. Select by GUMBEL TOP-K: sampling without replacement proportional
   to ``exp(weight / T)`` is exactly "order by ``weight + T * g_i``
   desc" with standard-Gumbel noise ``g_i`` (Vieira 2014) — one
   distributed top-k, no sequential sampling.

**Cross-engine exactness** (the lm.py / graph.py contract): per-feature
log-ratios and per-doc Gumbel noise are QUANTIZED to int64 micro-nats
(``round(ln(.) * 1e6)``) before any sum, so every aggregate is an exact
int64 sum — order-free, partitioning-free, and bit-identical in DuckDB
SQL. The doubles handed to ``ln`` are built from int64 counts (or the
murmur hash) by IEEE-exact ops only. Gumbel noise is a PURE FUNCTION of
``(doc_id, salt)`` — ``u = (murmur3(id:salt) + 0.5) / 2^32`` — so the
selection is reproducible across reruns, cluster sizes, and engines,
and never needs a driver-side RNG.

Scale shape (100 TB raw, ~GB-scale target): the target fit is one
tokens-scale map + one ``<= n_features``-row partial aggregate; the raw
fit the same over the crawl. The feature table (``n_features`` rows,
2^16 by default) BROADCASTS into the scoring pass — scoring is
map-only explode + broadcast join + per-doc int64 partial sum, no
shuffle wider than (doc_id, llq). Selection is one
TakeOrderedAndProject (k rows to the driver); for proportion-scale
cuts (k in the billions) use :func:`dsir_weights` plus a threshold
from ``approxQuantile`` instead of materializing a top-k.

No reference analog — the reference ingests everything it crawls
(/root/reference/processVideo/process.py). This module exists for the
LLM-training-pipeline mandate (corpus selection before mixing/packing,
upstream of curate.mix_corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import murmur3_u32
from ..functions.tokenizer import tokens_col

# int64 micro-nats, the shared quantization scale (see operators/lm.py).
LLQ_SCALE = 1_000_000
N_FEATURES_DEFAULT = 1 << 16
_U32 = 1 << 32


def _grams_col(text: Column) -> Column:
    """Unigram + bigram strings of the tokenized text, one array.
    Bigrams are space-joined (tokens are ``[a-z0-9]+``, so the joiner
    never collides) because the murmur feature hash runs over the
    gram's UTF-8 BYTES — the representation both engines replay."""
    toks = tokens_col(text)
    span = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, span),
        F.slice(toks, 2, span),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def doc_features(
    docs: DataFrame,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document hashed feature counts ``(doc_id, feature, count)``
    — the shared fastText-style featurizer (murmur3 of each
    unigram/bigram mod ``n_features``). Map-only explode + a
    map-side-combinable (doc, feature) aggregate; docs without tokens
    produce no rows (callers left-join if they need them)."""
    if not 2 <= int(n_features) <= _U32:
        raise ValueError("n_features must be in [2, 2^32]")
    grams = _grams_col(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("_g"))
        .select(
            "doc_id",
            F.pmod(murmur3_u32(F.col("_g")), F.lit(int(n_features)))
            .alias("feature"),
        )
        .groupBy("doc_id", "feature")
        .agg(F.count("*").alias("count"))
    )


def corpus_feature_counts(
    docs: DataFrame,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level hashed feature counts ``(feature, c)`` — at most
    ``n_features`` rows after the map-side combine."""
    grams = _grams_col(F.col(text_col))
    return (
        docs.select(F.explode(grams).alias("_g"))
        .select(
            F.pmod(murmur3_u32(F.col("_g")), F.lit(int(n_features)))
            .alias("feature")
        )
        .groupBy("feature")
        .agg(F.count("*").alias("c"))
    )


def _llq(p: Column) -> Column:
    return F.round(F.log(p) * F.lit(LLQ_SCALE)).cast("long")


def feature_log_ratios(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
) -> DataFrame:
    """The fitted importance model: ``(feature, lambda_llq)`` where
    ``lambda_llq = llq(p_target[f]) - llq(p_raw[f])`` in int64
    micro-nats, add-one smoothing over the ``n_features`` buckets
    (``p_x[f] = (c_x[f] + 1) / (N_x + n_features)``). Only features
    seen in either corpus get a row (unseen features would score
    ``llq(1/(N_t+F)) - llq(1/(N_r+F))``, but no raw doc can contain
    one, so the table stays ``<= n_features`` rows — broadcastable).
    Each ``ln`` input is one int64 add + one divide: IEEE-exact in
    both engines, then quantized before the subtraction."""
    nf = int(n_features)
    raw_c = corpus_feature_counts(raw_docs, nf, text_col)
    tgt_c = corpus_feature_counts(target_docs, nf, text_col).withColumnsRenamed(
        {"c": "ct"}
    )
    raw_tot = raw_c.agg(F.sum("c").alias("n_raw"))
    tgt_tot = tgt_c.agg(F.sum("ct").alias("n_tgt"))
    joined = (
        raw_c.join(tgt_c, "feature", "full_outer")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
    )
    c_r = F.coalesce(F.col("c"), F.lit(0))
    c_t = F.coalesce(F.col("ct"), F.lit(0))
    p_r = (c_r + F.lit(1)).cast("double") / (
        F.coalesce(F.col("n_raw"), F.lit(0)) + F.lit(nf)
    ).cast("double")
    p_t = (c_t + F.lit(1)).cast("double") / (
        F.coalesce(F.col("n_tgt"), F.lit(0)) + F.lit(nf)
    ).cast("double")
    return joined.select(
        "feature", (_llq(p_t) - _llq(p_r)).alias("lambda_llq")
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame | None = None,
    ratios: DataFrame | None = None,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-doc importance log-weight ``(doc_id, dsir_llq)`` (int64
    micro-nats): the doc's feature counts dotted with the fitted
    log-ratios. Pass either ``target_docs`` (fit here) or a
    pre-fitted ``ratios`` table (the production shape: fit once per
    crawl snapshot, reuse across selection runs). Gram-less docs keep
    a row with weight 0. Scoring is explode + BROADCAST join (the
    ratio table is ``<= n_features`` rows) + one per-doc int64 partial
    sum — nothing wider than (doc_id, llq) shuffles."""
    if (target_docs is None) == (ratios is None):
        raise ValueError("pass exactly one of target_docs / ratios")
    if ratios is None:
        ratios = feature_log_ratios(
            raw_docs, target_docs, n_features, text_col
        )
    feats = doc_features(raw_docs, n_features, text_col, id_col)
    scored = (
        feats.join(F.broadcast(ratios), "feature", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("count") * F.coalesce(F.col("lambda_llq"), F.lit(0))
            ).alias("dsir_llq")
        )
    )
    return (
        raw_docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dsir_llq"), F.lit(0)).cast("long")
            .alias("dsir_llq"),
        )
    )


def gumbel_llq(id_col: Column, salt: str, temperature: float) -> Column:
    """Quantized Gumbel noise ``round(T * g * 1e6)`` with
    ``g = -ln(-ln(u))``, ``u = (murmur3(id:salt) + 0.5) / 2^32`` — a
    pure function of (id, salt), strictly inside (0, 1) so both ``ln``
    calls are finite. The same double in both engines; see the module
    docstring for the quantization-boundary argument."""
    u = (
        murmur3_u32(id_col.cast("string"), salt=salt).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_U32))
    g = -F.log(-F.log(u))
    return F.round(g * F.lit(float(temperature) * LLQ_SCALE)).cast("long")


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame | None = None,
    k: int = 1000,
    ratios: DataFrame | None = None,
    n_features: int = N_FEATURES_DEFAULT,
    temperature: float = 1.0,
    salt: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-k importance resampling: the ``k`` raw docs with the
    largest ``dsir_llq + round(T * gumbel(doc_id:salt) * 1e6)``, ties
    broken by ``doc_id`` asc — a faithful without-replacement sample
    from ``p ~ exp(weight / T)`` (T -> 0 degenerates to hard top-k by
    weight). Returns every raw column plus ``dsir_llq`` and the
    ``key_llq`` the cut was made on. One TakeOrderedAndProject; k rows
    reach the driver."""
    if k < 0:
        raise ValueError("k must be >= 0")
    w = dsir_weights(
        raw_docs, target_docs, ratios, n_features, text_col, id_col
    )
    key = (
        F.col("dsir_llq")
        + gumbel_llq(F.col("doc_id"), salt, temperature)
    ).alias("key_llq")
    return (
        raw_docs.join(
            w.select("doc_id", "dsir_llq", key).withColumnRenamed(
                "doc_id", id_col
            ),
            id_col,
        )
        .orderBy(F.col("key_llq").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
