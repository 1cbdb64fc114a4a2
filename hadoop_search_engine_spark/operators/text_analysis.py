"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Generalizes the reference's only "NLP" (a dictionary keyword extractor,
/root/reference/client/src/utils/searchProcessor.ts:4-17) into the
column-level text statistics a web-scale curation pipeline runs over
every document. Everything is built-in expressions (JVM codegen) —
deliberately SQL-expressible so each operator has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens_col

# tiny deterministic stopword lists (heuristic language ID evidence)
EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"]


def token_count(text: Column) -> Column:
    """Whitespace/punct token count via the canonical tokenizer."""
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-like subword count proxy: word-piece boundaries at
    alpha/digit transitions plus per-4-chars splits of long words —
    cheap, deterministic, and a monotone proxy for LLM token cost."""
    words = tokens_col(text)
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.ceil(F.length(w) / 4).cast("int"), F.lit(1)),
    )


def _count_words_in(tokens: Column, vocab: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(vocab)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: stopword-evidence vote between en/es,
    'und' when no evidence. Deterministic, SQL-expressible — the shape
    of a real n-gram classifier with the model folded to a word list."""
    toks = tokens_col(text)
    en = _count_words_in(toks, EN_STOPWORDS)
    es = _count_words_in(toks, ES_STOPWORDS)
    return (
        F.when((en == 0) & (es == 0), F.lit("und"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def quality_score(text: Column) -> Column:
    """[0, 1] quality heuristic from length / punctuation / stopword /
    repetition ratios (the standard web-text quality features)."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = _count_words_in(toks, EN_STOPWORDS + ES_STOPWORDS)
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_penalty = F.when(n_chars > 0, 1.0 - F.least(n_punct * 5.0 / n_chars, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_score = F.when(n_tok > 0, F.least(stop * 10.0 / n_tok, F.lit(1.0))).otherwise(F.lit(0.0))
    return F.round(
        (len_score + punct_penalty + stop_score + distinct_ratio) / 4.0, 6
    )


def fingerprint(text: Column, mod: int = (1 << 56) - 5) -> Column:
    """Order-sensitive rolling polynomial hash over tokens
    (Rabin-Karp style): fp = sum token_hash_i * 31^(n-1-i) mod 2^56-5,
    folded left to right. Reordered tokens change the fingerprint;
    useful as a cheap content-version id.

    Token hash = Murmur3_x86_32 (Spark's built-in ``hash()``, a pure
    JVM expression), which functions.hashes replays exactly in DuckDB
    SQL — so the whole fingerprint sits on the DuckDB correctness
    board (previously xxhash64, which DuckDB can't express — the
    operator was stuck rows-only).

    The modulus is < 2^56 so the fold step `acc*31 + h` peaks below
    2^61 + 2^32 and never overflows int64 under ANSI mode (Spark 4
    default) — a 2^61-1 modulus would overflow at `acc*31`. Null text
    fingerprints to 0 (the empty fold), matching the oracle's
    coalesce."""
    from ..functions.hashes import murmur3_u32

    toks = tokens_col(text)
    fold = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 31 + murmur3_u32(w), F.lit(mod)),
    )
    return F.coalesce(fold, F.lit(0).cast("long"))


def tfidf_top_terms(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``n`` terms per document by ``tf * idf`` — the sparse
    document vector / keyword-extraction export a training pipeline
    materializes per doc (and the driver-side primitive behind
    ``more_like_this``, here as a corpus-wide distributed operator).

    Returns ``(doc_id, term, tf, weight, rank)``; ranking ties break
    by term ascending (deterministic, cross-engine). Weight uses the
    BM25-style idf (:func:`~..functions.bm25.idf_col`).

    Scale shape: one tokenize pass → tf groupBy (shuffle keyed on
    (doc_id, term), map-side combined) → df groupBy over distinct
    (term, doc) pairs → broadcast-join the vocab-sized df table back
    onto tf → per-doc row_number window. The window partitions by
    doc_id, so its sort is per-doc (bounded by distinct terms per
    doc), never corpus-wide; no driver-side materialization.
    """
    from pyspark.sql import Window

    from ..functions.bm25 import idf_col
    from .index_build import term_frequencies

    # term_frequencies expects the canonical (doc_id, text) names
    tf = term_frequencies(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    n_docs = docs.count()
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .withColumn(
            "weight",
            F.round(F.col("tf") * idf_col(n_docs, F.col("df")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                "weight", "rank")
    )


def analyze(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All analysis columns in one projection (single scan, codegen'd)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subwords"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


# -- PII redaction ------------------------------------------------------------
#
# Patterns are deliberately restricted to constructs with IDENTICAL
# semantics under Java regex (Spark executors) and RE2 (DuckDB oracle):
# character classes, bounded repetition, non-capturing groups, \b —
# no lookaround, no backreferences. Greedy leftmost matching agrees on
# all of these.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+[0-9][0-9()/ -]{6,18}[0-9]", "<PHONE>"),
}
PII_KINDS = tuple(PII_PATTERNS)


def redact_pii(
    docs: DataFrame,
    kinds: tuple[str, ...] = PII_KINDS,
    text_col: str = "text",
) -> DataFrame:
    """Scrub emails / IPv4 addresses / international phone numbers from
    ``text_col``, replacing each match with a typed placeholder — the
    PII-redaction pass a web corpus gets before training. Map-only
    chained ``regexp_replace`` (JVM codegen, no shuffle, no Python);
    at 100 TB it fuses with the parquet scan. Kinds apply in the fixed
    ``PII_PATTERNS`` order so overlapping matches resolve
    deterministically (emails first: an email never half-redacts into
    a phone match)."""
    col = F.col(text_col)
    for kind in PII_PATTERNS:  # fixed order, independent of `kinds` order
        if kind not in kinds:
            continue
        pat, repl = PII_PATTERNS[kind]
        col = F.regexp_replace(col, pat, repl)
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    return docs.withColumn(text_col, col)


def pii_counts(
    docs: DataFrame,
    kinds: tuple[str, ...] = PII_KINDS,
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus PII census: docs scanned, and per-kind total
    match count + docs containing at least one match. Single
    aggregation over regexp_count expressions (map-side combinable)."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    aggs = [F.count("*").alias("n_docs")]
    for kind in kinds:
        pat = PII_PATTERNS[kind][0]
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        aggs.append(F.sum(c).alias(f"{kind}_matches"))
        aggs.append(
            F.sum((c > 0).cast("long")).alias(f"{kind}_docs")
        )
    return docs.agg(*aggs)


def sql_redact_duckdb(expr: str, kinds: tuple[str, ...] = PII_KINDS) -> str:
    """DuckDB expression applying the SAME redaction chain as
    :func:`redact_pii` (RE2 'g' flag = Spark's replace-all default;
    DuckDB single-quoted strings keep backslashes raw)."""
    for kind in PII_PATTERNS:
        if kind not in kinds:
            continue
        pat, repl = PII_PATTERNS[kind]
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


# -- within-doc repetition (Gopher-style quality rule) ------------------------

def _ngrams_col(text: Column, n: int) -> Column:
    """All word n-grams of the text as an array of n-field structs
    (duplicates kept). Struct identity == token-tuple identity, so
    distinct-counting matches string-joined shingles exactly (tokens
    never contain the joiner) — but zipping n shifted slices is ~8x
    cheaper than building a string per gram (measured at sf0.01:
    repetition_stats 1.24 s -> 0.16 s), because it's one array
    allocation instead of per-gram concat + a slice per index."""
    toks = tokens_col(text)
    span = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, i + 1, span) for i in range(n)])


def repetition_stats(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition ratio — the Gopher "repetition"
    quality signal (docs that loop the same phrases are boilerplate or
    SEO spam): per doc, the fraction of word n-gram OCCURRENCES that
    are repeats of an earlier n-gram in the same doc,
    ``dup_ratio = 1 - distinct/total`` (0 for docs shorter than n
    tokens). Entirely JVM expressions (arrays_zip/array_distinct) —
    map-only, no shuffle, no Python; fuses with the scan at 100 TB.
    The gram array is materialized ONCE through an inner struct
    projection: higher-order expressions block Spark's subexpression
    elimination, so naming each stat off the raw grams expression
    would tokenize the doc once per output column."""
    grams = _ngrams_col(F.col(text_col), n)
    stats = F.struct(
        F.size(grams).alias("t"),
        F.size(F.array_distinct(grams)).alias("d"),
    )
    inner = docs.select(F.col(id_col), stats.alias("_s"))
    t, d = F.col("_s.t"), F.col("_s.d")
    return inner.select(
        id_col,
        t.alias("n_ngrams"),
        d.alias("n_distinct"),
        F.when(t > 0, F.round(1.0 - d / t, 6))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_ratio: float = 0.3,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop docs whose n-gram ``dup_ratio`` exceeds ``max_dup_ratio``
    (all original columns preserved; short docs always pass). The
    predicate is computed inline — still map-only, no join."""
    grams = _ngrams_col(F.col(text_col), n)
    total = F.size(grams)
    ratio = F.when(
        total > 0,
        1.0 - F.size(F.array_distinct(grams)) / total,
    ).otherwise(F.lit(0.0))
    return docs.where(ratio <= float(max_dup_ratio))


def corpus_mix_report(
    docs: DataFrame,
    by: tuple[str, ...] = ("lang",),
    text_col: str = "text",
) -> DataFrame:
    """Data-mix report: per group (language, source, ...) document and
    token counts, mean quality, and each group's SHARE of corpus docs
    and tokens — the table a training-data pipeline publishes before
    mixing ("en is 61% of tokens, web is 85% of docs"). One map-only
    annotation projection + one partial-aggregated groupBy; the 1-row
    totals frame joins back as a broadcast, so the output is
    |groups| rows regardless of corpus size."""
    if not by:
        raise ValueError("by must name at least one grouping column")
    ann = docs.select(
        *by,
        token_count(F.col(text_col)).alias("_nt"),
        quality_score(F.col(text_col)).alias("_q"),
    )
    g = ann.groupBy(*by).agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.avg("_q"), 6).alias("avg_quality"),
    )
    tot = g.agg(
        F.sum("n_docs").alias("_td"), F.sum("n_tokens").alias("_tt")
    )
    return g.crossJoin(F.broadcast(tot)).select(
        *by, "n_docs", "n_tokens", "avg_quality",
        F.round(F.col("n_docs") / F.col("_td"), 6).alias("doc_share"),
        F.round(F.col("n_tokens") / F.col("_tt"), 6).alias("token_share"),
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """PMI-scored bigram collocations over the corpus — the classic
    phrase-mining / tokenizer-vocab-induction signal (Church & Hanks
    1990): ``(term_a, term_b, pair_count, count_a, count_b, pmi)``
    for every adjacent word pair seen >= ``min_count`` times, with

        pmi = ln( (c_ab / N) / ((c_a / T) * (c_b / T)) )

    over bigram total N and token total T. High-PMI pairs are
    multiword units ("new york"); the ``min_count`` floor removes the
    hapax pairs whose PMI is spuriously maximal.

    Scale shape: two partial-aggregated groupBys (bigrams via the
    shifted-slice zip — no per-gram strings — and unigrams), then the
    pair frame joins the vocab-sized unigram counts twice on plain
    term keys (shuffle hash joins; the unigram side is |vocab|, never
    corpus-sized) and the two 1-row totals fold in as broadcasts.
    The PMI arithmetic is fixed-shape double math rounded at 6 dp —
    the DuckDB oracle replays it term for term."""
    grams = _ngrams_col(F.col(text_col), 2)
    all_pairs = (
        docs.select(F.explode(grams).alias("_g"))
        .select(
            F.col("_g").getField("0").alias("term_a"),
            F.col("_g").getField("1").alias("term_b"),
        )
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("pair_count"))
    )
    # N counts ALL bigram occurrences — the min_count floor prunes
    # which pairs are REPORTED, not the probability space
    ntot = all_pairs.agg(F.sum("pair_count").alias("_n"))
    pairs = all_pairs.where(F.col("pair_count") >= int(min_count))
    uni = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    tot = uni.agg(F.sum("cnt").alias("_t"))
    ua = uni.select(F.col("term").alias("term_a"), F.col("cnt").alias("count_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("cnt").alias("count_b"))
    joined = (
        pairs.join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ntot))
    )
    p_ab = F.col("pair_count").cast("double") / F.col("_n").cast("double")
    p_a = F.col("count_a").cast("double") / F.col("_t").cast("double")
    p_b = F.col("count_b").cast("double") / F.col("_t").cast("double")
    return joined.select(
        "term_a", "term_b", "pair_count", "count_a", "count_b",
        F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
    )


# -- corpus-level n-gram statistics (Wimbd-shape analyses) --------------------

def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams -> (gram, n_occurrences),
    count desc / gram asc (deterministic ties) — the headline "what's
    actually in this corpus" analysis of Wimbd (Elazar et al. 2023,
    "What's In My Big Data?"). One scan: grams built JVM-side from
    shifted array slices (:func:`_ngrams_col`), partial-aggregated
    map-side before the one shuffle, then TakeOrderedAndProject for
    the k rows — no driver-side corpus materialization at any scale."""
    grams = _ngrams_col(F.col(text_col), n)
    gram_str = F.array_join(
        F.array(*[F.col("_g").getField(str(i)) for i in range(n)]), " "
    )
    return (
        docs.select(F.explode(grams).alias("_g"))
        .select(gram_str.alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(int(k))
    )


def zipf_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Least-squares fit of ln(term frequency) against ln(frequency
    rank) over the whole corpus -> one row (slope, intercept, r2,
    n_terms). A natural-language corpus reads slope ~ -1 (Zipf's law);
    a templated / machine-generated one bends away — a cheap whole-
    corpus health probe. Rank is ``row_number`` over (count desc, term
    asc): total but deterministic, and identical in the DuckDB oracle.
    The window runs over the VOCABULARY (term, count) aggregate —
    lexicon-sized, not corpus-sized — then regr_* aggregates fold it
    to one row; the corpus itself is touched once by the count."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("lx"),
        F.log(F.col("cnt").cast("double")).alias("ly"),
    )
    return ranked.agg(
        F.round(F.expr("regr_slope(ly, lx)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(ly, lx)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(ly, lx)"), 6).alias("r2"),
        F.count("*").alias("n_terms"),
    )
