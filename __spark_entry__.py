"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query end-to-end on sf0.001;
``queries()`` exposes one DataFrame callable per implemented operator
from SURVEY.md §2 (+ the training-data-pipeline operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one. Column names and rounding are aligned on both
sides; doubles are rounded before output so the value-hash compare is
stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_search_engine_spark import BM25_B, BM25_K1
from hadoop_search_engine_spark.functions.bm25 import sql_idf, sql_score
from hadoop_search_engine_spark.functions.tokenizer import (
    sql_tokens_duckdb,
    tokens_col,
)

FLAGSHIP_TERMS = ["spark", "query", "table"]
ANN_K = 10


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k for a multi-term query over sf0.001 docs,
    served by the REAL engine — block index + search_topk — not the
    exhaustive DataFrame baseline."""
    return q_bm25_topk_indexed(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# documents-table queries (the search-engine surface)
# ---------------------------------------------------------------------------

def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer parity: every (doc_id, term) pair (SURVEY §2.7)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )


def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, tf) — groupBy replaces the reference's distinct()."""
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    return term_frequencies(_read(spark, sf_dir, "documents"))


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.index_build import (
        doc_stats,
        term_frequencies,
    )

    return doc_stats(term_frequencies(_read(spark, sf_dir, "documents")))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.index_build import (
        doc_stats,
        term_frequencies,
    )

    ds = doc_stats(term_frequencies(_read(spark, sf_dir, "documents")))
    return ds.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("doc_len"), 6).alias("avgdl"),
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core operator (README.md:423-427): term ->
    sorted posting list, plus df. Posting list serialized to a string
    so the cross-engine hash is type-stable."""
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    tf = term_frequencies(_read(spark, sf_dir, "documents"))
    return tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id")))).alias(
            "postings"
        ),
    )


def q_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.functions.bm25 import idf_col
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    docs = _read(spark, sf_dir, "documents")
    tf = term_frequencies(docs)
    n = docs.count()
    return (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .select("term", "df", F.round(idf_col(n, F.col("df")), 6).alias("idf"))
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.query_exec import bm25_topk_dataframe

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    top = bm25_topk_dataframe(docs, " ".join(FLAGSHIP_TERMS), k=20)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def _lexicon_has_ctf(lex_dir: str) -> bool:
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(lex_dir, "*.parquet"))
    if not files:
        return False
    return "ctf" in pq.read_schema(files[0]).names


# One real block index per sf_dir, built once per process and reused by
# every *_indexed query below (cached under /tmp keyed by the sf path;
# the lexicon is written last, so its _SUCCESS is the completion marker
# that guards against a half-built leftover from a killed process).
_ORACLE_INDEXES: dict = {}


def _oracle_index(
    spark: SparkSession,
    sf_dir: str,
    positions: bool = False,
    analyzed: bool = False,
):
    import hashlib

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    key = (os.path.abspath(sf_dir), positions, analyzed)
    ix = _ORACLE_INDEXES.get(key)
    if ix is not None and ix.spark is spark:
        return ix
    tag = hashlib.md5(key[0].encode()).hexdigest()[:12]
    d = (
        f"/tmp/hse_entry_index_{'pos_' if positions else ''}"
        f"{'ana_' if analyzed else ''}{tag}"
    )
    akw = {}
    if analyzed:
        from hadoop_search_engine_spark.functions.analyzer import (
            ENGLISH_STOPWORDS,
        )

        akw = {"stopwords": ENGLISH_STOPWORDS, "stem": "s"}
    complete = (
        os.path.exists(os.path.join(d, "stats.json"))
        and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
    )
    if complete and not _lexicon_has_ctf(os.path.join(d, "lexicon")):
        # cache from before the lexicon gained ctf (ranking.py's
        # LM-Dirichlet collection stats) — rebuild in place
        import shutil

        shutil.rmtree(d)
        complete = False
    if not complete:
        docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
        build_index(spark, docs, d, n_buckets=8, positions=positions, **akw)
    ix = Index.load(spark, d)
    _ORACLE_INDEXES[key] = ix
    return ix


def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION serving path on the oracle board: a real block
    index (delta+varint postings, block-max metadata) built over the
    sf documents, queried through search_topk's distributed scorer —
    checked against the SAME DuckDB SQL as the exhaustive bm25_topk.
    Reference analog: the serving map IS the whole reference engine
    (server/src/services/search.service.js:12-16)."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_indexed_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_topk's driver serving mode (bucket-pruned pyarrow reads +
    the same NumPy scorer, NO Spark job) against the bm25_topk oracle."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="driver")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered champion lists (operators/impact.py — the
    100x lever for disjunctive head-term queries recorded by the 12M
    audit): top-M-by-impact sidecar + certified bounds, scoring only
    the champion union with proof-or-fallback safety. Checked against
    the SAME exhaustive bm25_topk oracle — the pruned path is rank-
    and score-identical by construction, so it must hash-match the
    full corpus scan."""
    from hadoop_search_engine_spark.operators.impact import (
        ImpactLists,
        build_impact_lists,
        impact_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    have = ImpactLists.load(ix)
    if have is None or have.meta.get("m") != 32:
        build_impact_lists(ix, m=32, df_min=64)
    top = impact_topk(ix, " ".join(FLAGSHIP_TERMS), k=20)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_indexed_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive search_topk over the block index (WAND cover
    pruning path) against the bm25_topk_and oracle."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(
        ix, " ".join(FLAGSHIP_TERMS), k=20, mode="and", serving="spark"
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable similarity (operators/ranking.py) on the indexed
    serving path: LM Dirichlet (Lucene LMDirichletSimilarity — clamped
    per-term query-likelihood with a mu-smoothed collection model,
    p(t|C) = ctf/T from the new lexicon ctf column) over the SAME
    block index; the DuckDB oracle replays the formula from raw
    tokens. The capability the reference's posting-order 'ranking'
    (search.service.js:58-90) can't express at all."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark",
                      similarity="lm_dirichlet")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_lm_dirichlet_topk_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Dirichlet through driver serving (pyarrow reads + the same
    NumPy scorer, no Spark job) — same oracle as the spark row."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="driver",
                      similarity="lm_dirichlet")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_tfidf_classic_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF similarity (Lucene ClassicSimilarity, exact
    float64 — no 8-bit norm quantization) on the indexed path:
    (1+ln(N/(df+1)))^2 * sqrt(tf)/sqrt(dl) per matched term."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark",
                      similarity="tfidf")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_boolean_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean similarity (ES `boolean`): score = number of matched
    query terms (boost-weighted); ties broken doc_id asc. Uses the
    WAND path's constant block bounds — cover pruning still applies."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark",
                      similarity="boolean")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_match_scores_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scored FULL match set (query_exec.scored_docs) — the
    composition primitive under multi_match, function_score,
    search_topk_fields, and boosted_topk: every matched doc with its
    exact BM25 score, no top-k cut, cost ∝ query df. Oracle = the
    bm25 SQL without its LIMIT."""
    from hadoop_search_engine_spark.operators.query_exec import scored_docs

    ix = _oracle_index(spark, sf_dir)
    out = scored_docs(ix, " ".join(FLAGSHIP_TERMS))
    return out.select("doc_id", F.round("score", 4).alias("score"))


# Multi-field index: title = first 8 whitespace fields of text, body =
# the rest — a deterministic split both engines can derive from the
# documents table (no extra input data), giving the two fields truly
# different statistics (df, dl, avgdl) like a real title/body pair.
def _mf_field_exprs():
    return {
        "title": F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " "),
        "body": F.array_join(
            F.slice(F.split(F.col("text"), " "), 9, 1 << 20), " "
        ),
    }


_MF_INDEXES: dict = {}


def _mf_oracle_index(spark: SparkSession, sf_dir: str):
    import hashlib

    from hadoop_search_engine_spark.operators.multifield import (
        MultiFieldIndex,
        build_multifield_index,
    )

    key = os.path.abspath(sf_dir)
    mf = _MF_INDEXES.get(key)
    if mf is not None and mf.spark is spark:
        return mf
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_mf_{tag}"
    # fields.json is written LAST (atomic rename) — its presence is the
    # completion marker; a half-built leftover rebuilds from scratch
    if not os.path.exists(os.path.join(d, "fields.json")):
        docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
        mf = build_multifield_index(spark, docs, d, _mf_field_exprs(),
                                    n_buckets=8)
    else:
        mf = MultiFieldIndex.load(spark, d)
    _MF_INDEXES[key] = mf
    return mf


MF_BOOSTS = {"title": 3.0, "body": 1.0}


def q_combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES combined_fields (term-centric BM25F): field boosts fold
    into the TERM FREQUENCIES (tf_c = sum w_f * tf_f over one
    combined length norm), so a term spread across fields saturates
    once — vs multi_match's independently-saturating per-field
    scores. Oracle replays the weighted-token union and the combined
    df/dl/avgdl arithmetic exactly."""
    from hadoop_search_engine_spark.operators.multifield import (
        combined_fields_topk,
    )

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
        .alias("title"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 9, 1 << 20),
                     " ").alias("body"),
    )
    top = combined_fields_topk(
        docs, " ".join(FLAGSHIP_TERMS),
        {"title": "title", "body": "body"}, boosts=MF_BOOSTS, k=100_000,
    )
    return _quantized_topk(top, k=20)


def q_multi_match_most_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match most_fields over a real two-field index (one
    complete sub-index per field, field-accurate df/dl/avgdl):
    combined = sum over fields of boost * field BM25, via the full
    per-field scored match sets (a doc outside one field's top-k can
    lead the combined ranking). Capability the single-blob reference
    index cannot express (its Scala job indexes one (file, words)
    pair, README.md:423-427)."""
    from hadoop_search_engine_spark.operators.multifield import multi_match

    mf = _mf_oracle_index(spark, sf_dir)
    top = multi_match(mf, " ".join(FLAGSHIP_TERMS), k=20, boosts=MF_BOOSTS)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_multi_match_best_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match best_fields with tie_breaker 0.3 — max field
    score + 0.3 * the rest — served driver-side (no Spark job) and
    wrapped back to the DataFrame contract."""
    from hadoop_search_engine_spark.operators.multifield import (
        multi_match_rows,
    )

    mf = _mf_oracle_index(spark, sf_dir)
    pairs = multi_match_rows(mf, " ".join(FLAGSHIP_TERMS), k=20,
                             boosts=MF_BOOSTS, combine="best_fields",
                             tie_breaker=0.3)
    df = spark.createDataFrame(pairs or [], "doc_id long, score double")
    return df.select("doc_id", F.round("score", 4).alias("score"))


def q_function_score_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score: BM25 relevance * gauss decay on n_chars
    (origin 300, scale 150, decay 0.5) — the freshness/length-prior
    re-weighting a query alone cannot express; exact over the FULL
    match set (not a rescore window)."""
    from hadoop_search_engine_spark.operators.hybrid import function_score

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    top = function_score(
        ix, " ".join(FLAGSHIP_TERMS), docs, k=20,
        decay={"kind": "gauss", "field": "n_chars",
               "origin": 300.0, "scale": 150.0},
    )
    return top.select("doc_id", "score")


def q_function_score_fvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score field_value_factor: relevance + log1p(n_chars
    * 0.01) (boost_mode=sum) — additive popularity-style boost."""
    from hadoop_search_engine_spark.operators.hybrid import function_score

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    top = function_score(
        ix, " ".join(FLAGSHIP_TERMS), docs, k=20, boost_mode="sum",
        field_value_factor={"field": "n_chars", "factor": 0.01,
                            "modifier": "log1p"},
    )
    return top.select("doc_id", "score")


# ES JSON query DSL (operators/dsl.py): each entry compiles a request
# body onto an existing exact path and is checked against that path's
# SAME oracle — certifying the migration surface end to end.
def q_dsl_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{"query": {"match": ...}} → search_topk over the block index;
    same oracle as bm25_topk."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    r = search_dsl(ix, {"query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
                        "size": 20})
    return r.hits.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool must/should/must_not → the boolean retrieval engine;
    compiles to `spark AND ((query OR merge)) NOT vector` — same
    oracle as boolean_search."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    body = {"query": {"bool": {
        "must": [{"term": {"text": "spark"}},
                 {"bool": {"should": [{"term": {"text": "query"}},
                                      {"term": {"text": "merge"}}]}}],
        "must_not": [{"term": {"text": "vector"}}],
    }}, "size": 20}
    r = search_dsl(ix, body)
    return r.hits.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool must match + non-scoring metadata filter (term on lang) →
    search_topk's cogroup eligibility page; same oracle as
    filtered_search (global statistics, mask before top-k)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    body = {"query": {"bool": {
        "must": [{"match": {"text": " ".join(FLAGSHIP_TERMS)}}],
        "filter": [{"term": {"lang": "en"}}],
    }}, "size": 20}
    r = search_dsl(ix, body, documents=docs)
    return r.hits.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """function_score with gauss decay through the DSL — same oracle
    as function_score_gauss."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    body = {"query": {"function_score": {
        "query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
        "gauss": {"n_chars": {"origin": 300.0, "scale": 150.0}},
    }}, "size": 20}
    r = search_dsl(ix, body, documents=docs)
    return r.hits.select("doc_id", "score")


def q_dsl_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL collapse stage (ES field collapsing over a ranked window)
    — same window-50 semantics and oracle as collapsed_search."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    body = {"query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
            "size": 20, "collapse": {"field": "lang", "window": 50}}
    r = search_dsl(ix, body, documents=docs)
    return r.hits.select("doc_id", "lang",
                         F.round("score", 4).alias("score"))


def q_dsl_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL knn clause (ES 8 dense-vector search) — exact cosine over
    the embeddings table; same oracle as ann_cosine_topk (the query
    vector is vec 0, passed as the DSL's query_vector literal)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ix = _oracle_index(spark, sf_dir)
    r = search_dsl(ix, {"knn": {"field": "embedding",
                                "query_vector": [float(x) for x in qvec],
                                "k": ANN_K}},
                   embeddings=emb)
    return r.hits


# Time-partitioned index (ES data stream / ILM): derived doc
# timestamps (2026-01-01 + doc_id % 120 days -> four calendar months,
# deterministic in both engines), monthly sub-indexes, range-routed
# federated search with per-doc boundary masks.
TPI_EPOCH = 1767225600  # 2026-01-01T00:00:00Z
TPI_LO_US = (TPI_EPOCH + 14 * 86400) * 1_000_000  # 2026-01-15
TPI_HI_US = (TPI_EPOCH + 68 * 86400) * 1_000_000  # 2026-03-10

_TPI_INDEXES: dict = {}


def _tpi_oracle_index(spark: SparkSession, sf_dir: str):
    import hashlib

    from hadoop_search_engine_spark.operators.time_partitioned import (
        TimePartitionedIndex,
        build_time_partitioned_index,
    )

    key = os.path.abspath(sf_dir)
    t = _TPI_INDEXES.get(key)
    if t is not None and t.spark is spark:
        return t
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_tpi_{tag}"
    if not os.path.exists(os.path.join(d, "periods.json")):
        docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
        docs = docs.withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(TPI_EPOCH) + (F.col("doc_id") % 120) * 86400
            ),
        )
        t = build_time_partitioned_index(spark, docs, d, interval="month",
                                         n_buckets=8)
    else:
        t = TimePartitionedIndex.load(spark, d)
    _TPI_INDEXES[key] = t
    return t


def q_time_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-routed search over a month-partitioned index (ES data
    stream): the manifest prunes non-overlapping periods outright
    (April never probed), interior periods (February) serve
    unchanged, boundary periods (January/March) mask per doc BEFORE
    top-k; statistics are global over the SELECTED periods. The
    lifecycle capability (rollover/retention/routing) the monolithic
    reference index has no analog for."""
    from hadoop_search_engine_spark.operators.time_partitioned import (
        search_time_range,
    )

    t = _tpi_oracle_index(spark, sf_dir)
    out = search_time_range(t, " ".join(FLAGSHIP_TERMS), TPI_LO_US,
                            TPI_HI_US, k=20)
    return out.select("period", "doc_id",
                      F.round("score", 4).alias("score"))


# Raw analyzed-path query: the analyzer (Lucene classic stopword set +
# Harman S-stem) must strip the stopwords and stem queries->query,
# tables->table — landing exactly on the flagship terms, but against
# an index whose CORPUS was analyzed the same way (different tf/df
# than the plain index; the oracle recomputes both over analyzed
# tokens).
ANALYZED_QUERY = "the spark and the queries of tables"


def q_analyzed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analysis-chain parity (functions/analyzer.py): every (doc_id,
    term) pair after stopword filter + S-stem, JVM column path vs the
    DuckDB CASE replay. The Lucene StandardAnalyzer+stem surface the
    reference engine lacks entirely (its only analysis is
    lower+punct-strip, searchProcessor.ts:5)."""
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
        analyze_tokens_col,
    )

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            analyze_tokens_col(
                tokens_col(F.col("text")), ENGLISH_STOPWORDS, "s"
            )
        ).alias("term"),
    )


def q_bm25_topk_analyzed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over an ANALYZED index (stopwords + S-stem applied at
    build, recorded in stats.json, auto-applied to the query): the
    raw stopword-laden query must score identically to the DuckDB
    replay that analyzes both corpus and query in SQL."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir, analyzed=True)
    top = search_topk(ix, ANALYZED_QUERY, k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_analyzed_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver serving over the analyzed index — same oracle."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir, analyzed=True)
    top = search_topk(ix, ANALYZED_QUERY, k=20, serving="driver")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_phrase_search_analyzed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase over an analyzed POSITIONAL index: positions were
    renumbered contiguously after stopword removal at build, so the
    first two ANALYZED tokens of doc 0 are adjacent — the oracle
    replays adjacency over the analyzed token lists in SQL."""
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
        analyze,
    )
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True, analyzed=True)
    row = (
        _read(spark, sf_dir, "documents")
        .where(F.col("doc_id") == 0)
        .select("text")
        .collect()[0]
    )
    toks = analyze(row["text"], ENGLISH_STOPWORDS, "s")
    # first adjacent pair that is a FIXED POINT of the analyzer: a
    # stemmed corpus token can collide with a stopword ("its"->"it")
    # and query-side re-analysis would drop it; the oracle SQL indexes
    # the same pair by position, so both sides pick identically
    tfn = ix.token_fn()
    i = 0
    while not (tfn(toks[i]) == toks[i] and tfn(toks[i + 1]) == toks[i + 1]):
        i += 1
    top = phrase_search(ix, f"{toks[i]} {toks[i + 1]}", k=20)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-as-you-type (ES match_phrase_prefix): doc 0's first
    token as the fixed phrase, the first 3 chars of its second token
    as the prefix — expansions capped at 50 by (df desc, term asc),
    the cap REPLAYED in the oracle SQL. Scoring = fixed-term partials
    + each contained expansion's partial over the match set."""
    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.query_exec import (
        phrase_prefix_search,
    )

    ix = _oracle_index(spark, sf_dir, positions=True)
    row = (
        _read(spark, sf_dir, "documents")
        .where(F.col("doc_id") == 0)
        .select("text")
        .collect()[0]
    )
    toks = tokenize(row["text"])
    top = phrase_prefix_search(
        ix, f"{toks[0]} {toks[1][:3]}", k=100_000, max_expansions=50
    )
    return _quantized_topk(top, k=20)


def q_doc_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc term vectors (ES _termvectors term/position surface):
    docs 0-4 decoded from the positional block index, positions joined
    to a comma string for the value-hash compare; the oracle replays
    tokenize + per-term position lists over the same docs."""
    from hadoop_search_engine_spark.operators.query_exec import term_vectors

    ix = _oracle_index(spark, sf_dir, positions=True)
    tv = term_vectors(ix, [0, 1, 2, 3, 4])
    return tv.select(
        "doc_id", "term", "tf",
        F.array_join("positions", ",").alias("positions"),
    )


def q_bm25_topk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving-node fast path (search_topk_rows: hot-postings LRU
    + plain pairs, no Spark job, no DataFrame on the serving side) on
    the oracle board — the pairs are wrapped into a DataFrame HERE
    only so the driver can compare them to the SAME DuckDB SQL as
    bm25_topk; the serving call itself never touches Spark."""
    import pandas as pd

    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_rows,
    )

    ix = _oracle_index(spark, sf_dir)
    pairs = search_topk_rows(ix, " ".join(FLAGSHIP_TERMS), k=20)
    pairs = search_topk_rows(ix, " ".join(FLAGSHIP_TERMS), k=20)  # hot LRU
    pdf = pd.DataFrame(pairs, columns=["doc_id", "score"]).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    return spark.createDataFrame(pdf).select(
        "doc_id", F.round("score", 4).alias("score")
    )


def q_bm25_topk_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time (k1, b) override on the real index — relevance
    tuning with NO rebuild (blocks store raw (max_tf, min_dl), so any
    parameterization's bounds/partials recompute at query time); the
    oracle rescores in SQL with the same tuned constants."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(
        ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark", k1=0.9, b=0.25
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_term_boosted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term query boosts (Lucene ``term^w`` syntax) through the
    real index: parse_query_boosted folds each boost into the term's
    idf, so every scorer — dense, WAND incl. its block upper bounds,
    driver rows — stays exact with no scorer changes
    (operators/query_exec.py). The oracle multiplies the same
    per-term factor into the idf inside the BM25 sum."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(ix, "spark^2 query table^0.5", k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_msm_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match (ES semantics) through the real index:
    docs containing >= 2 of the 3 flagship terms, scored with the
    standard disjunctive BM25 over all their matched terms — the
    distinct-term count comes from the pruned postings decode and
    rides the doc_filter eligibility page (operators/query_exec.py
    search_topk(min_should_match=...)). Oracle: the bm25_topk replay
    with HAVING count(DISTINCT term) >= 2."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    top = search_topk(
        ix, " ".join(FLAGSHIP_TERMS), k=20, min_should_match=2, serving="spark"
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_filtered_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered search_topk over the block index: the
    doc_filter eligibility mask rides the cogroup scorer's doc-length
    page (global statistics) — against the filtered_search oracle."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    filt = docs.where(F.col("lang") == "en").select("doc_id")
    top = search_topk(
        ix, " ".join(FLAGSHIP_TERMS), k=20, serving="spark", doc_filter=filt
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered BM25: eligibility mask (lang = 'en'), GLOBAL
    corpus statistics — surviving scores equal the unfiltered query's
    (operators/query_exec.py bm25_topk_dataframe(doc_filter=) /
    search_topk(doc_filter=))."""
    from hadoop_search_engine_spark.operators.query_exec import bm25_topk_dataframe

    docs = _read(spark, sf_dir, "documents")
    filt = docs.where(F.col("lang") == "en").select("doc_id")
    top = bm25_topk_dataframe(
        docs.select("doc_id", "text"), " ".join(FLAGSHIP_TERMS), k=20,
        doc_filter=filt,
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) BM25 top-k — every query term must match
    (capability the reference's OR-only search lacks, SURVEY §2.6)."""
    from hadoop_search_engine_spark.operators.query_exec import bm25_topk_dataframe

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    top = bm25_topk_dataframe(docs, " ".join(FLAGSHIP_TERMS), k=20, mode="and")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def _quantized_topk(df, k: int = 20, nd: int = 4):
    """Re-rank a scored frame by its ROUNDED score with doc_id
    tie-break, then cut to k — the selection rule the DuckDB oracles
    apply (their output alias `score` IS round(score, nd), and SQL
    ORDER BY resolves the alias), so a k-th-place tie at the rounding
    boundary picks the same doc in both engines. Without this the
    engine ranks by the exact float while the oracle ranks by the
    quantized one, and two docs whose cross-engine doubles straddle
    the boundary swap at the cut (round-4 sf0.1 board catch). Callers
    overfetch the FULL match set (bounded: these are query-matched
    sets, never corpus scans) so the quantized cut sees every tie
    candidate."""
    s = F.round(F.col("score"), nd)
    return (
        df.select("doc_id", s.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def _flagship_phrase(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic data-derived phrase: doc 0's first two tokens.
    The oracle SQL derives the SAME pair in a CTE, so both engines
    query the identical phrase without hard-coding corpus content."""
    from hadoop_search_engine_spark.functions.tokenizer import tokenize

    docs = _read(spark, sf_dir, "documents")
    text = docs.where(F.col("doc_id") == 0).select("text").first()[0]
    toks = tokenize(text)
    return " ".join(toks[:2])


def q_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase BM25 over a POSITIONAL block index (gap-encoded
    per-doc token positions), driver serving — the oracle replays the
    adjacency as a token-array window filter and scores matches with
    the standard BM25 sum. Capability the reference's OR-only engine
    lacks entirely (SURVEY §2.6)."""
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = phrase_search(ix, _flagship_phrase(spark, sf_dir), k=100_000,
                        serving="driver")
    return _quantized_topk(top, k=20)


def q_phrase_indexed_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same phrase query through the distributed cogroup scorer."""
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = phrase_search(ix, _flagship_phrase(spark, sf_dir), k=100_000,
                        serving="spark")
    return _quantized_topk(top, k=20)


def _flagship_prox(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic data-derived proximity pair: doc 0's 1st and 3rd
    tokens (one intervening token — matches at slop >= 1, so slop=2
    exercises a real window). The oracle SQL derives the SAME pair."""
    from hadoop_search_engine_spark.functions.tokenizer import tokenize

    docs = _read(spark, sf_dir, "documents")
    text = docs.where(F.col("doc_id") == 0).select("text").first()[0]
    toks = tokenize(text)
    return f"{toks[0]} {toks[2]}"


def q_proximity_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-proximity search (phrase with slop=2: up to two
    intervening tokens per gap, order enforced) over the positional
    block index, driver serving — the oracle replays the window as a
    position self-join over the unnested token arrays."""
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = phrase_search(ix, _flagship_prox(spark, sf_dir), k=20,
                        serving="driver", slop=2)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_proximity_indexed_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same proximity query through the distributed cogroup scorer."""
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = phrase_search(ix, _flagship_prox(spark, sf_dir), k=20,
                        serving="spark", slop=2)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNORDERED proximity (span_near inOrder=false): both flagship
    proximity terms within any 4-token window, either order, BM25
    ranked — driver serving; oracle replays the start-at-occurrence
    window test with EXISTS per term."""
    from hadoop_search_engine_spark.operators.query_exec import near_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = near_search(ix, _flagship_prox(spark, sf_dir), window=4, k=20,
                      serving="driver")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_near_search_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same unordered-window query through the distributed scorer."""
    from hadoop_search_engine_spark.operators.query_exec import near_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = near_search(ix, _flagship_prox(spark, sf_dir), window=4, k=20,
                      serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-30 over the REAL block index fused
    with exact-cosine top-30 over the embeddings table by reciprocal
    rank fusion (operators/hybrid.py). The oracle replays both branch
    rankings (BM25 CTE + list_cosine_similarity) and the exact RRF sum
    over the same integer ranks."""
    from hadoop_search_engine_spark.operators.hybrid import hybrid_topk

    ix = _oracle_index(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    top = hybrid_topk(
        ix, " ".join(FLAGSHIP_TERMS), emb, list(qvec),
        k=15, k_lex=30, k_vec=30,
    )
    # rank 0 = "not surfaced by this branch" (NULL would round-trip
    # as NaN through the duckdb/pandas compare)
    return top.select(
        "doc_id", "rrf",
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
    )


def q_rescore_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rescore: BM25 top-40 window from the real index, re-ranked
    by qw*bm25 + rw*cosine(embedding, query vec) — phase-2 cost
    bounded by the window, embeddings pruned by broadcast semi-join.
    The oracle replays the window, the left join, and the rounded
    combine."""
    from hadoop_search_engine_spark.operators.hybrid import rescore_topk

    ix = _oracle_index(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return rescore_topk(
        ix, " ".join(FLAGSHIP_TERMS), emb, list(qvec),
        window=40, k=15, query_weight=1.0, rescore_weight=2.0,
    )


def q_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix query over the real index: 's' expands to its top-4
    lexicon terms by (df desc, term asc) — the capped MultiTermQuery
    rewrite — then standard disjunctive BM25. The oracle replays the
    expansion (LIKE + df ranking + cap) and the expanded-terms score."""
    from hadoop_search_engine_spark.operators.query_exec import prefix_search

    ix = _oracle_index(spark, sf_dir)
    top = prefix_search(ix, "s", k=20, max_expansions=4, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard query 's?a*' (? = one char, * = any run) over the real
    index — lexicon-only expansion, BM25 over the expansions; the
    oracle's LIKE 's_a%' is the exact same pattern algebra."""
    from hadoop_search_engine_spark.operators.query_exec import wildcard_search

    ix = _oracle_index(spark, sf_dir)
    top = wildcard_search(ix, "s?a*", k=20, max_expansions=10, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_regexp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp query 's(park|can|ort)' (ES regexp, whole-term anchored)
    over the real index — lexicon-only expansion capped by (df desc,
    term asc), then disjunctive BM25; the oracle replays the anchored
    regexp_matches expansion and the expanded-terms score."""
    from hadoop_search_engine_spark.operators.query_exec import regexp_search

    ix = _oracle_index(spark, sf_dir)
    top = regexp_search(ix, "s(park|can|ort)", k=20, max_expansions=10,
                        serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_pinned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pinned query: docs 17 and 5 forced to the top IN THAT ORDER
    (artificial descending scores, 1e9 base), a nonexistent id
    skipped, then organic BM25 hits minus the pins."""
    from hadoop_search_engine_spark.operators.query_exec import pinned_search

    ix = _oracle_index(spark, sf_dir)
    top = pinned_search(ix, [17, 5, 10**12], " ".join(FLAGSHIP_TERMS),
                        k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_sorted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-sorted search (ES sort replacing _score): docs matching
    the flagship OR query ordered by n_chars desc — matching via the
    index's df-proportional frame, (field, doc_id) TakeOrdered limit.
    Oracle: the distinct matched docs joined to documents, same
    ordering."""
    from hadoop_search_engine_spark.operators.query_exec import sorted_matches

    ix = _oracle_index(spark, sf_dir)
    fields = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sorted_matches(ix, " ".join(FLAGSHIP_TERMS), fields, "n_chars",
                          k=20, ascending=False)


def q_paginated_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor pagination (search_after) on the real index: page 2 is
    fetched with after = last pair of page 1 — the oracle computes the
    same rows as LIMIT 20 OFFSET 20 over the full ranking, proving the
    cursor is exact (no deep-paging over-fetch)."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk

    ix = _oracle_index(spark, sf_dir)
    q = " ".join(FLAGSHIP_TERMS)
    p1 = search_topk(ix, q, k=20, serving="spark").collect()
    after = (p1[-1]["doc_id"], p1[-1]["score"])
    top = search_topk(ix, q, k=20, serving="spark", after=after)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf*idf terms (sparse doc vectors / keyword
    extraction) — distributed window over per-doc term weights; the
    oracle replays tf, df, idf, the rounded weight, and the
    (weight desc, term asc) rank in SQL."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_top_terms(docs, n=3)


def q_bm25_topk_resharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relayout certification: the oracle index resharded (decode +
    re-encode of index bytes — corpus never re-tokenized: new shard
    span/buckets/blocks via operators/index_maint.reshard_index), then
    queried through search_topk against the SAME bm25 oracle SQL —
    proving the physical layout is score-invisible."""
    import hashlib

    from hadoop_search_engine_spark.operators.index_maint import reshard_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_reshard_{tag}"
    if not (
        os.path.exists(os.path.join(d, "stats.json"))
        and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
    ):
        reshard_index(spark, ix.out_dir, d, shard_span=512, n_buckets=4,
                      block_size=64)
    nd = Index.load(spark, d)
    top = search_topk(nd, " ".join(FLAGSHIP_TERMS), k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_multifield_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-field search (BM25F-lite): the text field (the
    oracle index) and a SOURCE field index over the same doc_id space,
    fused as 1.0·BM25_text + 2.0·BM25_source via the exact
    scored_docs union (a doc outside every field's top-k can still win
    combined). The oracle replays both fields' BM25 (each with its own
    df/avgdl/N) and the weighted sum in SQL."""
    import hashlib

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk_fields,
    )

    ix_text = _oracle_index(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_srcidx_{tag}"
    if not (
        os.path.exists(os.path.join(d, "stats.json"))
        and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
    ):
        src_docs = _read(spark, sf_dir, "documents").select(
            "doc_id", F.col("source").alias("text")
        )
        build_index(spark, src_docs, d, n_buckets=4)
    ix_src = Index.load(spark, d)
    top = search_topk_fields(
        [(ix_text, 1.0), (ix_src, 2.0)], "spark src1", k=20
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_bm25_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static index pruning certified: the oracle index pruned at
    max_df_ratio=0.79 (stop-like head terms dropped, posting bytes
    saved), then the flagship query — the oracle replays prune
    semantics exactly in SQL: tf filtered to kept terms, per-doc
    lengths CARRIED from the full corpus, n/avgdl over surviving
    docs."""
    import hashlib

    from hadoop_search_engine_spark.operators.index_maint import prune_index
    from hadoop_search_engine_spark.operators.query_exec import (
        Index,
        search_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_pruned_{tag}"
    if not (
        os.path.exists(os.path.join(d, "stats.json"))
        and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
    ):
        prune_index(spark, ix.out_dir, d, max_df_ratio=0.79)
    nd = Index.load(spark, d)
    top = search_topk(nd, " ".join(FLAGSHIP_TERMS), k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_fuzzy_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant search end-to-end on the real index: 'spark qery'
    — the OOV term is spell-corrected to its best lexicon candidate
    (distance asc, df desc, term asc within 1 edit) and the corrected
    query runs the standard BM25. The oracle replays the correction
    with DuckDB's levenshtein and scores the corrected terms."""
    from hadoop_search_engine_spark.operators.query_exec import (
        fuzzy_search_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    top = fuzzy_search_topk(ix, "spark qery", k=20, max_edits=1,
                            serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_boosted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static document prior fused at query time over the real index:
    score = BM25 + 0.5 · (n_chars / 1000) — the pagerank/quality
    signal shape. Exact via the scored_docs full-match frame (a boost
    can promote a doc from outside the BM25 top-k); the oracle adds
    the same prior to the scored CTE in SQL."""
    from hadoop_search_engine_spark.operators.query_exec import boosted_topk

    ix = _oracle_index(spark, sf_dir)
    boosts = _read(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") / 1000.0).alias("boost")
    )
    top = boosted_topk(ix, " ".join(FLAGSHIP_TERMS), boosts, k=20,
                       boost_weight=0.5)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_decay_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score decay fused at query time over the real
    index: score = BM25 · gauss(n_chars; origin=1000, scale=800,
    decay=0.5) — the recency/proximity ranking shape (same machinery
    serves timestamp freshness). Exact via the scored_docs full-match
    frame; the oracle replays the gauss multiplier in SQL with the
    identical driver-folded sigma^2 constant."""
    from hadoop_search_engine_spark.operators.query_exec import decay_topk

    ix = _oracle_index(spark, sf_dir)
    fields = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    top = decay_topk(
        ix, " ".join(FLAGSHIP_TERMS), fields, origin=1000.0, scale=800.0,
        k=20, decay=0.5, fn="gauss", field_col="n_chars",
    )
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relevance-evaluation harness on the real index: a 3-query batch
    run (one query per flagship term, k=10) scored against
    deterministic graded qrels (every doc containing the term, rel =
    1 + doc_id % 2); nDCG/MRR/P/R@10 per query. The oracle replays the
    run (BM25 row_number per query), the qrels, and every metric
    formula in SQL."""
    from hadoop_search_engine_spark.operators.evaluate import (
        evaluate_ranking,
        run_from_batch,
    )
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_batch,
    )
    from hadoop_search_engine_spark.functions.tokenizer import tokens_col

    ix = _oracle_index(spark, sf_dir)
    queries = {f"q_{t}": t for t in FLAGSHIP_TERMS}
    run = run_from_batch(search_topk_batch(ix, queries, k=10))
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    )
    qrels = None
    for t in FLAGSHIP_TERMS:
        qr = docs.where(F.array_contains("toks", t)).select(
            F.lit(f"q_{t}").alias("query_id"),
            "doc_id",
            (F.lit(1) + F.col("doc_id") % 2).cast("int").alias("rel"),
        )
        qrels = qr if qrels is None else qrels.unionByName(qr)
    per_q = evaluate_ranking(run, qrels, k=10)
    return per_q.select(
        "query_id", "n_rel", "n_rel_ret", "ndcg", "mrr",
        F.col("precision").alias("p_at_k"),
        F.col("recall").alias("r_at_k"),
    )


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test assignment — a pure
    function of (doc_id, salt): stable across reruns, partitioning,
    cluster sizes, and engines (the DuckDB oracle replays the murmur3
    split bit-exactly). The reproducible-split primitive a training
    pipeline needs instead of plan-dependent randomSplit."""
    from hadoop_search_engine_spark.operators.curate import split_corpus

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return split_corpus(docs).select("doc_id", "split")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-mix rebalancing
    step ("keep 20% of en, all of zh, half of the rest") as a pure
    function of (doc_id, salt): map-only filter, no sampling job, and
    the DuckDB oracle replays the salted-murmur3 keep decision
    bit-exactly."""
    from hadoop_search_engine_spark.operators.curate import (
        stratified_sample,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, {"en": 0.2, "zh": 1.0}, strata_col="lang", default_rate=0.5
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs (deterministic split)
    sharing word 4-grams with the held-out test split — eval n-gram
    set broadcast, overlap counted per train doc; the oracle replays
    the split, the shingling, and the overlap join in SQL."""
    from hadoop_search_engine_spark.operators.curate import (
        contamination_report,
        split_corpus,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    sp = split_corpus(docs)
    return contamination_report(
        sp.where("split <> 'test'"), sp.where("split = 'test'"), n=4
    )


def q_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train split with every contaminated doc removed (any shared
    4-gram with the test split disqualifies): the anti-join shape of
    the same overlap computation."""
    from hadoop_search_engine_spark.operators.curate import (
        decontaminate,
        split_corpus,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    sp = split_corpus(docs)
    kept = decontaminate(
        sp.where("split <> 'test'").select("doc_id", "text"),
        sp.where("split = 'test'"),
        n=4,
    )
    return kept.select("doc_id")


def _lined_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthetic boilerplate shape: source and lang
    become per-doc header lines (repeated across thousands of docs,
    like navbars/footers), the unique body is the last line."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat_ws("\n", "source", "lang", "text").alias("text"),
    )


def q_line_dedup_drop_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: every copy of a line whose corpus
    df exceeds 3 is dropped (the source/lang header lines vanish, each
    unique body survives); text rebuilt in original line order."""
    from hadoop_search_engine_spark.operators.curate import dedup_lines

    return dedup_lines(
        _lined_docs(spark, sf_dir), max_line_df=3, mode="drop_all"
    )


def q_line_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style keep-one-copy line dedup: an over-frequent line
    survives only at its globally first (doc_id, pos) occurrence."""
    from hadoop_search_engine_spark.operators.curate import dedup_lines

    return dedup_lines(
        _lined_docs(spark, sf_dir), max_line_df=3, mode="keep_first"
    )


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic synthetic PII appended (an email,
    an IPv4, a phone number derived from existing columns) — the
    corpus itself is PII-free, so the redaction rows plant their own."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat_ws(
            " ",
            "text",
            F.concat(F.col("source"), F.lit("@mail."), F.col("lang")),
            F.lit("from"),
            F.concat(
                F.lit("10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".7"),
            ),
            F.concat(
                F.lit("call +1 555-01"),
                F.lpad((F.col("doc_id") % 90).cast("string"), 2, "0"),
            ),
        ).alias("text"),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails / IPv4s / phone numbers replaced by typed
    placeholders — map-only chained regexp_replace, patterns restricted
    to the Java-regex ∩ RE2 dialect so the DuckDB oracle replays the
    exact same redaction."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        redact_pii,
    )

    return redact_pii(_pii_docs(spark, sf_dir))


def q_pii_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII census: per-kind match totals and affected-doc
    counts in ONE map-side-combinable aggregation."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        pii_counts,
    )

    return pii_counts(_pii_docs(spark, sf_dir))


def q_top_hits_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms + top_hits: the 2 best-scoring hits per source over
    the FULL match set of the flagship query (scored_docs frame from
    the real index); oracle replays the BM25 scored set + per-group
    row_number."""
    from hadoop_search_engine_spark.operators.query_exec import (
        scored_docs,
        top_hits_facet,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    sc = scored_docs(ix, " ".join(FLAGSHIP_TERMS))
    return top_hits_facet(sc, docs, "source", n=2)


def q_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k: symmetric per-vector quantization
    (floor(127·v/max|v| + 0.5), scales cancel out of the cosine),
    integer dot products — the 4x-smaller serving table for ANN at
    scale. The oracle replays quantization and the exact integer
    arithmetic."""
    from hadoop_search_engine_spark.operators.similarity import (
        cosine_topk_int8,
        quantize_embeddings,
    )

    emb = _read(spark, sf_dir, "embeddings")
    qvec = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    qt = quantize_embeddings(emb)
    return cosine_topk_int8(qt, qvec, k=ANN_K)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over a
    deterministic hash-derived link graph (3 out-links per doc) — the
    iterative-join-loop algorithm class, in fixed-point int64 mass
    units so every iteration replays bit-exactly in DuckDB (float
    summation order would diverge)."""
    from hadoop_search_engine_spark.functions.hashes import murmur3_u32
    from hadoop_search_engine_spark.operators.graph import pagerank

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        murmur3_u32(
                            F.col("doc_id").cast("string"),
                            salt=f"link{j}",
                        ),
                        F.lit(n),
                    )
                    for j in range(3)
                ]
            )
        ).alias("dst"),
    ).persist()
    return pagerank(edges, n_iters=3)


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) of the events log + per-
    session rollup — lag/cumsum windows keyed on user_id, timestamps
    compared at exact unix microseconds; the oracle replays the same
    windows."""
    from hadoop_search_engine_spark.operators.sessions import session_stats

    out = session_stats(_read(spark, sf_dir, "events"))
    # micros as strings: the driver compare round-trips all-numeric
    # rows through a float upcast (pandas iterrows), which %.6g-mangles
    # 16-digit int64s on the oracle side only
    return out.select(
        "user_id", "session_idx", "n_events",
        F.col("start_us").cast("string").alias("start_us"),
        F.col("end_us").cast("string").alias("end_us"),
        "value_sum", "duration_sec",
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream Markov matrix: (prev_type -> next_type) counts with
    the chain reset at session boundaries."""
    from hadoop_search_engine_spark.operators.sessions import (
        event_transitions,
    )

    return event_transitions(_read(spark, sf_dir, "events"))


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sessionization (applyInPandasWithState, NoTimeout):
    the events parquet replayed as a file-source stream, closed
    sessions collected via a memory sink. Deterministic: closed
    sessions == the batch sessionizer's rows minus each user's last
    (still-open) session — which is exactly what the oracle selects."""
    import tempfile

    from hadoop_search_engine_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(src):
        # the streaming file source wants a DIRECTORY; hardlink (or
        # copy) the single-file table into a temp dir
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="hse_ss_src_")
        try:
            os.link(src, os.path.join(d, "events.parquet"))
        except OSError:
            shutil.copy(src, os.path.join(d, "events.parquet"))
        stream_src = d
    else:
        stream_src = src
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(stream_src)
    )
    name = "hse_stream_sessions"
    q = (
        sessionize_stream(stream, gap_minutes=30.0)
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="hse_ss_"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    out = spark.sql(f"select * from {name}")
    return out.select(
        "user_id", "session_idx", "n_events",
        F.col("start_us").cast("string").alias("start_us"),
        F.col("end_us").cast("string").alias("end_us"),
        F.round("value_sum", 6).alias("value_sum"),
    )


def q_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix report per (lang, source): docs, tokens, mean quality,
    and each group's share of corpus docs/tokens — |groups| output rows
    via one annotation projection + one groupBy + a broadcast totals
    join."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        corpus_mix_report,
    )

    return corpus_mix_report(
        _read(spark, sf_dir, "documents"), by=("lang", "source")
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition: per-doc bigram occurrence /
    distinct counts and dup_ratio — map-only JVM expressions."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        repetition_stats,
    )

    return repetition_stats(
        _read(spark, sf_dir, "documents"), n=2
    )


def q_repetition_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs surviving the repetition rule (bigram dup_ratio <= 0.2) —
    the filter variant, predicate computed inline with no join."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        repetition_filter,
    )

    return repetition_filter(
        _read(spark, sf_dir, "documents").select("doc_id", "text"),
        max_dup_ratio=0.2, n=2,
    ).select("doc_id")


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc perplexity under a self-trained Stupid-Backoff bigram
    LM (the CCNet quality signal) — integer micro-nat sums, so the
    value replays bit-exactly in SQL."""
    from hadoop_search_engine_spark.operators.lm import doc_perplexity

    # sum_llq stringified: the driver compare float-upcasts all-numeric
    # rows, and a 9-digit int formatted through %.6g loses digits
    return doc_perplexity(_read(spark, sf_dir, "documents")).select(
        "doc_id", "n_tokens", F.col("sum_llq").cast("string").alias("sum_llq"),
        "ppl",
    )


def q_lm_ppl_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity band filter survivors (ppl <= 30.5)."""
    from hadoop_search_engine_spark.operators.lm import perplexity_filter

    return perplexity_filter(
        _read(spark, sf_dir, "documents"), max_ppl=30.5
    ).select("doc_id")


def q_lm_suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester ("did you mean"): doc 0's first two tokens
    each corrupted with a trailing 'x' (data-derived, nothing
    hard-coded), corrected via per-token Levenshtein candidates scored
    by the bigram LM + noisy-channel edit penalty, exact k-best
    Viterbi. The oracle enumerates the same lattice in SQL."""
    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.lm import (
        suggest_phrase,
        train_lm,
    )

    docs = _read(spark, sf_dir, "documents")
    t0 = tokenize(docs.orderBy("doc_id").first()["text"])[:2]
    query = " ".join(w + "x" for w in t0)
    unigrams, bigrams = train_lm(docs)
    return suggest_phrase(
        spark, query, unigrams, bigrams,
        max_edits=1, per_token=5, topn=3,
    )


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis: doc 0's top-3 tf*idf terms become a disjunctive
    BM25 query, source doc excluded — the oracle derives the same term
    selection (tf from the token CTE, idf from the corpus formula) and
    replays the search in SQL."""
    from hadoop_search_engine_spark.operators.query_exec import (
        more_like_this,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    top = more_like_this(ix, docs, 0, m=3, k=10, serving="driver")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term BM25 breakdown (Lucene-Explanation analog) for the
    flagship query's top-1 document: term, tf-in-doc, global df, idf,
    and contribution — contributions sum to the search score (by test);
    the oracle recomputes every column in SQL for the same doc."""
    from hadoop_search_engine_spark.operators.query_exec import (
        explain_score,
        search_topk_rows,
    )

    ix = _oracle_index(spark, sf_dir)
    q = " ".join(FLAGSHIP_TERMS)
    (doc_id, _score), *_ = search_topk_rows(ix, q, k=1)
    ex = explain_score(ix, q, doc_id)
    return ex.select(
        "term", "tf", "df",
        F.round("idf", 6).alias("idf"),
        F.round("contribution", 6).alias("contribution"),
    )


#: the boolean flagship: conjunction, nested disjunction, and an
#: exclusion — every operator of the ranked-boolean surface in one query
BOOLEAN_QUERY = "spark AND (query OR merge) NOT vector"


def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-boolean retrieval (nested AND/OR/NOT), exhaustive two-scan
    baseline — capability the reference's flat OR-union engine lacks
    (search.service.js:12-16 unions per-term probes only)."""
    from hadoop_search_engine_spark.operators.boolean import (
        boolean_topk_dataframe,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    top = boolean_topk_dataframe(docs, BOOLEAN_QUERY, k=20)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_boolean_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same boolean query through the block index: per-shard
    posting-set algebra (presence vectors + NumPy tree evaluation) and
    the distributed grouped-map scorer, against the same SQL oracle."""
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    ix = _oracle_index(spark, sf_dir)
    top = search_topk_boolean(ix, BOOLEAN_QUERY, k=20, serving="spark")
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_boolean_search_indexed_driver(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Boolean serving from the driver (bucket-pruned pyarrow reads +
    hot-postings LRU, no Spark job) — same oracle."""
    from hadoop_search_engine_spark.operators.boolean import (
        search_topk_boolean,
    )

    ix = _oracle_index(spark, sf_dir)
    top = search_topk_boolean(ix, BOOLEAN_QUERY, k=20, serving="driver")
    return top.select("doc_id", F.round("score", 4).alias("score"))


#: the batch-serving query set: one multi-term OR, one mid, one single
BATCH_QUERIES = {
    "flagship_or": " ".join(FLAGSHIP_TERMS),
    "pair": " ".join(FLAGSHIP_TERMS[:2]),
    "single": FLAGSHIP_TERMS[1],
}

# The full 30-word content vocabulary of the synthetic documents
# corpus (TESTDATA.md) — the term pool the bench fixture queries draw
# from. Static so the DuckDB oracle can replay the identical text.
_CORPUS_VOCAB = [
    "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "value", "vector", "window",
    "query", "the",
]

# 50 deterministic 1-3-term queries over the corpus vocabulary — the
# batch-serving certification set at the bench fixture's real fan-in
# (VERDICT r03 #8: bm25_topk_batch was certified at only 3 queries).
# Affine index mixing, no RNG, so the set is stable across runs.
BATCH_QUERIES_50 = {
    f"q{i:02d}": " ".join(
        sorted({
            _CORPUS_VOCAB[i % 30],
            _CORPUS_VOCAB[(i * 7 + 3) % 30],
            _CORPUS_VOCAB[(i * 13 + 5) % 30],
        })
    )
    for i in range(50)
}


def _oracle_segments(spark: SparkSession, sf_dir: str) -> list:
    """Two segment indexes per sf (documents split by doc_id parity,
    ORIGINAL ids kept — so federated results compare directly against
    the union-corpus SQL oracles), cached like _oracle_index."""
    import hashlib

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.query_exec import Index

    key = ("segs", os.path.abspath(sf_dir))
    segs = _ORACLE_INDEXES.get(key)
    if segs is not None and segs[0].spark is spark:
        return segs
    tag = hashlib.md5(key[1].encode()).hexdigest()[:12]
    out = []
    for i in range(2):
        d = f"/tmp/hse_entry_seg{i}_{tag}"
        if not (
            os.path.exists(os.path.join(d, "stats.json"))
            and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
        ):
            docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
            build_index(
                spark, docs.where(F.col("doc_id") % 2 == i), d, n_buckets=8
            )
        out.append(Index.load(spark, d))
    _ORACLE_INDEXES[key] = out
    return out


def q_federated_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated serving across two segments with GLOBAL statistics —
    oracle-checked against the union-corpus BM25 SQL (the segments
    keep original doc_ids, so federation must be invisible)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_segments,
    )

    segs = _oracle_segments(spark, sf_dir)
    top = search_topk_segments(segs, " ".join(FLAGSHIP_TERMS), k=20)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_federated_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving over the federated deployment — whole query set,
    global stats, one pass per segment; same oracle as the
    single-index batch (federation + batching both invisible)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_segments_batch,
    )

    segs = _oracle_segments(spark, sf_dir)
    out = search_topk_segments_batch(segs, BATCH_QUERIES, k=20)
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def q_bm25_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving: the whole query set in ONE distributed pass
    (union-pruned postings scan, per-shard decode shared across
    queries), per query bit-identical to search_topk — the oracle
    replays each query's BM25 and unions the per-query top-20."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk_batch

    ix = _oracle_index(spark, sf_dir)
    out = search_topk_batch(ix, BATCH_QUERIES, k=20, serving="spark")
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def q_bm25_topk_batch_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving with NO Spark job: one pyarrow read of the union
    filter, all queries scored from the driver-pinned pages."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk_batch

    ix = _oracle_index(spark, sf_dir)
    out = search_topk_batch(ix, BATCH_QUERIES, k=20, serving="driver")
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def q_bm25_topk_batch_50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving at the bench fixture's REAL fan-in: all 50
    deterministic vocabulary queries in ONE distributed pass — the
    union-pruned postings scan + shared per-shard decode is certified
    at the fan-in the serving bench actually runs, not a 3-query toy
    (operators/query_exec.py search_topk_batch)."""
    from hadoop_search_engine_spark.operators.query_exec import search_topk_batch

    ix = _oracle_index(spark, sf_dir)
    out = search_topk_batch(ix, BATCH_QUERIES_50, k=10, serving="spark")
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def q_bm25_topk_batch_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid champion batch (operators/impact.py
    impact_topk_batch_rows): certified queries served from the
    sidecar, the uncertified remainder in ONE shared-decode dense
    batch — bit-identical to search_topk_batch by construction, so
    it rides the SAME 50-query oracle as bm25_topk_batch_50."""
    from hadoop_search_engine_spark.operators.impact import (
        ImpactLists,
        build_impact_lists,
        impact_topk_batch_rows,
    )

    ix = _oracle_index(spark, sf_dir)
    have = ImpactLists.load(ix)
    if have is None or have.meta.get("m") != 32:
        build_impact_lists(ix, m=32, df_min=64)
    got = impact_topk_batch_rows(ix, BATCH_QUERIES_50, k=10)
    rows = [
        (qid, int(d), float(s))
        for qid, pairs in got.items()
        for d, s in pairs
    ]
    out = spark.createDataFrame(
        rows, "query_id string, doc_id long, score double"
    )
    return out.select(
        "query_id", "doc_id", F.round("score", 4).alias("score")
    )


def q_facet_counts_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceting over the INDEX's recall path (matched_docs: pruned
    postings scan + batched blob decode), same oracle as facet_counts."""
    from hadoop_search_engine_spark.operators.query_exec import (
        facet_counts,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    return facet_counts(
        matched_docs(ix, " ".join(FLAGSHIP_TERMS)), docs, ["lang"]
    )


def q_histogram_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation over the indexed hit set: n_chars in
    interval-200 buckets, empty interior buckets filled
    (min_doc_count=0). Oracle replays floor-bucketing + a generate_
    series gap fill."""
    from hadoop_search_engine_spark.operators.query_exec import (
        histogram_facets,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return histogram_facets(m, docs, "n_chars", 200.0, min_doc_count=0)


def q_range_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation over the indexed hit set: overlapping
    [from, to) ranges each counted independently, empty ranges 0."""
    from hadoop_search_engine_spark.operators.query_exec import (
        matched_docs,
        range_facets,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return range_facets(
        m, docs, "n_chars",
        [("short", None, 500), ("mid", 400, 1500), ("long", 1500, None),
         ("none", 10**9, None)],
    )


def q_stats_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats aggregation (count/min/max/avg/sum of n_chars) over
    the indexed hit set."""
    from hadoop_search_engine_spark.operators.query_exec import (
        matched_docs,
        stats_facet,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return stats_facet(m, docs, "n_chars")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term statistics from the index lexicon (ES _termvectors field
    stats): df + idf per flagship term, absent terms omitted."""
    from hadoop_search_engine_spark.operators.query_exec import term_stats

    ix = _oracle_index(spark, sf_dir)
    return term_stats(ix, " ".join(FLAGSHIP_TERMS) + " zzzabsent")


def q_percentiles_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation (exact linear interpolation) of
    n_chars over the indexed hit set — DuckDB replays with
    quantile_cont."""
    from hadoop_search_engine_spark.operators.query_exec import (
        matched_docs,
        percentiles_facet,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return percentiles_facet(m, docs, "n_chars")


def q_cardinality_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation (exact path) of source over the
    indexed hit set."""
    from hadoop_search_engine_spark.operators.query_exec import (
        cardinality_facet,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return cardinality_facet(m, docs, "source")


def q_terms_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg with include/exclude key filters: whole-key
    anchored regex include ('e.' matches en/es, never a substring),
    value-list exclude, ES semantics."""
    from hadoop_search_engine_spark.operators.query_exec import (
        facet_counts,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return facet_counts(m, docs, ["lang"], include="e.|de|fr",
                        exclude=["fr"])


def q_terms_order_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg ORDERED BY a metric sub-agg (order: {avg_len:
    desc}, size 3) — buckets ranked by the sub-aggregation value,
    key-asc tie-break."""
    from hadoop_search_engine_spark.operators.analytics import (
        terms_metrics_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return terms_metrics_facet(
        m, docs, "lang", {"avg_len": ("avg", "n_chars")},
        order=("avg_len", False), size=3,
    )


def q_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics aggregation: (lang, source) read off the 3
    longest matched docs — sort-field desc, doc_id-asc tie-break."""
    from hadoop_search_engine_spark.operators.analytics import (
        top_metrics_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return top_metrics_facet(m, docs, ["lang", "source"], "n_chars",
                             size=3)


def _daily_total_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared parent for the pipeline-agg entries: daily
    date_histogram over the indexed hit set (ts derived
    deterministically from doc_id; all metric values integer-valued so
    window sums are float-exact) with a sum(n_chars) sub-agg."""
    from hadoop_search_engine_spark.operators.analytics import (
        date_histogram_metrics_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id") * 3600)
    )
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return date_histogram_metrics_facet(
        m, docs, "ts", "day", {"total": ("sum", "n_chars")}
    )


def q_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent pipeline aggregations: cumulative_sum of the daily
    total + derivative of the daily doc count, window passes over the
    bucket-sized frame (first derivative bucket is null, ES
    semantics)."""
    from hadoop_search_engine_spark.operators.analytics import (
        cumulative_sum_col,
        derivative_col,
    )

    f = _daily_total_frame(spark, sf_dir)
    f = cumulative_sum_col(f, "total", out_col="cum")
    f = derivative_col(f, "n_docs", out_col="growth")
    # entry-level: null-vs-NaN is not comparable across engines, so
    # present the first bucket's (ES-null) derivative as 0
    return f.withColumn("growth", F.coalesce("growth", F.lit(0.0)))


def q_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_script + bucket_selector: a computed per-bucket
    ratio (mean doc length = total / count) then a HAVING-style
    bucket filter (count >= 5)."""
    from hadoop_search_engine_spark.operators.analytics import (
        bucket_script_col,
        bucket_selector,
    )

    f = _daily_total_frame(spark, sf_dir)
    f = bucket_script_col(f, {"t": "total", "n": "_count"},
                          "params.t / params.n", "mean_len")
    return bucket_selector(f, {"n": "_count"}, "params.n >= 5")


def q_max_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES max_bucket SIBLING pipeline agg: the day (keys) with the
    largest total, value + tied bucket keys."""
    from hadoop_search_engine_spark.operators.analytics import (
        sibling_bucket_stat,
    )

    return sibling_bucket_stat(_daily_total_frame(spark, sf_dir),
                               "total", "max_bucket")


def _rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # floor(value) keeps every stored sum integer-valued in double —
    # float summation order can then never shift the result between
    # engines or partitionings
    return _read(spark, sf_dir, "events").withColumn(
        "v", F.floor("value").cast("double")
    )


_ROLLUP_METRICS = {
    "n_events": ("count", "*"),
    "v_sum": ("sum", "v"),
    "v_max": ("max", "v"),
}


def q_rollup_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup (operators/rollup.py): hourly
    (bucket, event_type) aggregates materialized partitioned-by-date,
    then a 10-day range query answered FROM the rollup — identical to
    aggregating the raw events (the oracle does exactly that)."""
    import tempfile

    from hadoop_search_engine_spark.operators.rollup import (
        create_rollup,
        rollup_range,
    )

    out = os.path.join(tempfile.gettempdir(),
                       f"hse_rollup_{abs(hash(sf_dir)) % 10**8}")
    create_rollup(_rollup_events(spark, sf_dir), out, period="hour",
                  dims=("event_type",), metrics=_ROLLUP_METRICS)
    return rollup_range(spark, out, "2024-01-10 00:00:00",
                        "2024-01-20 00:00:00",
                        ("bucket", "event_type"))


def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup refresh: base built on events before
    Jan 20, the remainder folded in WITHOUT re-scanning old raw data
    (delta partials merged into the affected tail partitions); the
    full-span range query must equal the raw one-shot aggregation."""
    import tempfile

    from hadoop_search_engine_spark.operators.rollup import (
        create_rollup,
        refresh_rollup,
        rollup_range,
    )

    ev = _rollup_events(spark, sf_dir)
    cut = "2024-01-20 00:00:00"
    out = os.path.join(tempfile.gettempdir(),
                       f"hse_rollup_inc_{abs(hash(sf_dir)) % 10**8}")
    create_rollup(ev.where(F.col("ts") < F.to_timestamp(F.lit(cut))),
                  out, period="hour", dims=("event_type",),
                  metrics=_ROLLUP_METRICS)
    refresh_rollup(spark,
                   ev.where(F.col("ts") >= F.to_timestamp(F.lit(cut))),
                   out)
    return rollup_range(spark, out, None, None,
                        ("bucket", "event_type"))


def q_rare_terms_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms aggregation: the LONG-TAIL buckets — n_chars
    values seen in at most 2 matched docs, count ASC (the mirror of
    terms, which shows the head)."""
    from hadoop_search_engine_spark.operators.analytics import rare_terms_facet
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return rare_terms_facet(m, docs, "n_chars", max_doc_count=2)


def q_date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_range aggregation over the events table: per-window
    counts of click events ([from, to) semantics, open sides,
    overlapping 'all' window counted independently)."""
    from hadoop_search_engine_spark.operators.analytics import date_range_facet

    ev = _read(spark, sf_dir, "events")
    d = ev.select(F.col("event_id").alias("doc_id"), "ts")
    m = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("doc_id")
    )
    return date_range_facet(
        m, d, "ts",
        [("w1", None, "2024-01-08 00:00:00"),
         ("w2", "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
         ("rest", "2024-01-15 00:00:00", None),
         ("all", None, None)],
    )


def q_multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms aggregation: buckets keyed by the (lang, source)
    TUPLE over the indexed hit set, top-8 by count desc then keys asc."""
    from hadoop_search_engine_spark.operators.analytics import multi_terms_facet
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return multi_terms_facet(m, docs, ["lang", "source"], size=8)


def q_weighted_avg_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg metric aggregation: sum(v*w)/sum(w) of n_chars
    over the indexed hit set with a deterministic derived weight."""
    from hadoop_search_engine_spark.operators.analytics import (
        single_metric_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").withColumn(
        "w", (F.col("doc_id") % 7 + 1).cast("double")
    )
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return single_metric_facet(m, docs, "weighted_avg", "n_chars",
                               weight_field="w")


def q_dsl_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSL range aggregation with ES auto keys (regression: the DSL
    used to pass 2-tuples into range_facets' 3-tuple unpack — every
    DSL range agg crashed before session 9)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    r = search_dsl(
        ix,
        {"query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
         "aggs": {"len": {"range": {
             "field": "n_chars",
             "ranges": [{"to": 500}, {"from": 400, "to": 1500},
                        {"from": 1500, "key": "long"}]}}}},
        documents=docs,
    )
    return r.aggs["len"]


def q_snippets_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippets/highlighting materialized from the INDEXED hit set."""
    from hadoop_search_engine_spark.operators.query_exec import (
        materialize_with_snippets,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    hits = matched_docs(ix, " ".join(FLAGSHIP_TERMS)).select(
        "doc_id", F.lit(0.0).alias("score")
    )
    out = materialize_with_snippets(
        hits, docs.select("doc_id", "text"), FLAGSHIP_TERMS,
        width=40, mark=("[", "]"),
    )
    return out.select("doc_id", "match_pos", "snippet")


def q_collapsed_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing over the indexed scorer's top-50."""
    from hadoop_search_engine_spark.operators.query_exec import (
        collapse_topk,
        search_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=50, serving="spark")
    out = collapse_topk(top, docs.select("doc_id", "lang"), "lang", k=20)
    return out.select("doc_id", "lang", F.round("score", 4).alias("score"))


def q_suggest_terms_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete from the driver-cached lexicon (no Spark job on the
    lookup), same oracle as the corpus-scan suggest_terms."""
    from hadoop_search_engine_spark.operators.query_exec import suggest_terms

    ix = _oracle_index(spark, sf_dir)
    return suggest_terms(ix, "s", k=10)


def q_fuzzy_terms_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo candidates from the length-bucketed, charmask-prefiltered
    driver lexicon, same oracle as the corpus-scan fuzzy_terms."""
    from hadoop_search_engine_spark.operators.query_exec import fuzzy_terms

    ix = _oracle_index(spark, sf_dir)
    return fuzzy_terms(ix, "scann", max_edits=1, k=5)


def q_or_union_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REFERENCE's exact serving semantics through the real index:
    or_union_search (terms in query order, posting order, first-seen
    dedup — search.service.js:58-90) producing (rank, doc_id,
    matched_term); the oracle replays the ranking as a window over
    (first matching term position, doc_id)."""
    from hadoop_search_engine_spark.operators.query_exec import or_union_search

    ix = _oracle_index(spark, sf_dir)
    return or_union_search(ix, " ".join(FLAGSHIP_TERMS))


def q_search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-hits counting through the real index (Lucene
    TotalHitCountCollector / ES track_total_hits): the bucket-pruned
    postings decode counted without scoring or materializing results
    (operators/analytics.py count_matches); oracle = COUNT(DISTINCT
    doc) over the disjunctive token match."""
    from hadoop_search_engine_spark.operators.analytics import count_matches

    ix = _oracle_index(spark, sf_dir)
    return count_matches(ix, " ".join(FLAGSHIP_TERMS), mode="or")


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch-style significant_terms over the flagship query's
    result set: foreground doc ids from the index's postings,
    background df from its lexicon, only the matched docs re-read from
    the corpus (operators/analytics.py significant_terms, JLH scorer);
    the oracle replays fg/bg document frequencies and the exact JLH
    arithmetic over the unnested tokens."""
    from hadoop_search_engine_spark.operators.analytics import significant_terms

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return significant_terms(
        ix, docs, " ".join(FLAGSHIP_TERMS), k=20, min_fg_df=2, scorer="jlh"
    )


def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search (ES percolator): which registered queries match
    each doc — OR, AND, and min_match requirements over a broadcast
    compiled query-term table, one tokenize pass, counts gated per
    (doc, query) (operators/percolate.py). The oracle replays the
    distinct-term join + HAVING gate in SQL."""
    from hadoop_search_engine_spark.operators.percolate import percolate

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    qs = [
        {"query_id": "any", "query_text": "spark query"},
        {"query_id": "all", "query_text": "spark query table",
         "mode": "and"},
        {"query_id": "m2", "query_text": "spark query table",
         "min_match": 2},
    ]
    return percolate(docs, qs)


def q_percolate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING percolation path on the board: replays exactly
    what streaming/stateful.py percolate_stream's foreachBatch does —
    queries compiled ONCE driver-side into the (query_id, term,
    n_required) frame, then each micro-batch joined against that
    broadcast table. The corpus is split into two micro-batches by
    doc_id parity and the per-batch match sets unioned; percolation is
    per-doc (no cross-batch state), so the union equals the one-shot
    oracle and the row certifies the stream plan's compile + join."""
    from hadoop_search_engine_spark.operators.percolate import (
        compile_queries,
        percolate,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    qs = [
        {"query_id": "any", "query_text": "spark query"},
        {"query_id": "all", "query_text": "spark query table",
         "mode": "and"},
        {"query_id": "m2", "query_text": "spark query table",
         "min_match": 2},
    ]
    qdf = spark.createDataFrame(
        compile_queries(qs, None),
        "query_id string, term string, n_required int",
    )  # compiled once, reused per batch — percolate_stream's contract
    batches = [
        docs.where(F.col("doc_id") % 2 == i) for i in (0, 1)
    ]
    out = percolate(batches[0], qdf)
    for b in batches[1:]:
        out = out.unionByName(percolate(b, qdf))
    return out


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faceted search: per-lang counts of docs matching any flagship
    term (operators/query_exec.py matched_docs_dataframe + facet_counts;
    indexed variant matched_docs is score-path tested in pytest)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        facet_counts,
        matched_docs_dataframe,
    )

    docs = _read(spark, sf_dir, "documents")
    matched = matched_docs_dataframe(
        docs.select("doc_id", "text"), " ".join(FLAGSHIP_TERMS)
    )
    return facet_counts(matched, docs, ["lang"])


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result snippets + whole-word highlight for every doc matching a
    flagship term (operators/query_exec.py materialize_with_snippets):
    ±40-char window around the earliest case-insensitive match, query
    terms wrapped in [] — all built-in expressions over the hit set."""
    from hadoop_search_engine_spark.operators.query_exec import (
        materialize_with_snippets,
        matched_docs_dataframe,
    )

    docs = _read(spark, sf_dir, "documents")
    matched = matched_docs_dataframe(
        docs.select("doc_id", "text"), " ".join(FLAGSHIP_TERMS)
    )
    hits = matched.select("doc_id", F.lit(0.0).alias("score"))
    out = materialize_with_snippets(
        hits, docs.select("doc_id", "text"), FLAGSHIP_TERMS,
        width=40, mark=("[", "]"),
    )
    return out.select("doc_id", "match_pos", "snippet")


def q_collapsed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-collapsed search (operators/query_exec.py collapse_topk):
    BM25 top-50, best result per lang, top-20 of the collapsed set —
    the Elasticsearch collapse / 'similar results omitted' shape."""
    from hadoop_search_engine_spark.operators.query_exec import (
        bm25_topk_dataframe,
        collapse_topk,
    )

    docs = _read(spark, sf_dir, "documents")
    top = bm25_topk_dataframe(
        docs.select("doc_id", "text"), " ".join(FLAGSHIP_TERMS), k=50
    )
    out = collapse_topk(top, docs.select("doc_id", "lang"), "lang", k=20)
    return out.select(
        "doc_id", "lang", F.round("score", 4).alias("score")
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events table: users bucketed
    by first-event week, per (cohort, week-offset) active counts and
    retention shares."""
    from hadoop_search_engine_spark.operators.sessions import (
        cohort_retention,
    )

    return cohort_retention(_read(spark, sf_dir, "events"), "week")


def q_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel (first-touch
    ordering): per step, users who reached it in sequence."""
    from hadoop_search_engine_spark.operators.sessions import funnel_counts

    return funnel_counts(_read(spark, sf_dir, "events"),
                         ["view", "click", "purchase"])


def q_bucket_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-z-score anomaly flags over the daily click timeline
    (window 7, z 2) — the ops alert a rollup feeds."""
    from hadoop_search_engine_spark.operators.analytics import (
        bucket_anomalies,
    )

    ev = _read(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return bucket_anomalies(daily, "n", window=7, z=2.0).orderBy(
        "bucket"
    )


def q_significant_terms_bg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with ES background_filter: bg statistics from
    the lang='en' subset instead of the whole corpus ("unusual
    relative to English pages")."""
    from hadoop_search_engine_spark.operators.analytics import (
        significant_terms,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    bg = docs.where(F.col("lang") == "en").select("doc_id")
    return significant_terms(ix, docs, " ".join(FLAGSHIP_TERMS), k=15,
                             fg=m, background=bg)


def q_interleave_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slot-balanced interleaving of two live engine runs (default
    BM25 vs tuned (k1=0.9, b=0.25)) over the batch query set — the
    online-experiment merge, team attribution included; the oracle
    replays both rankings AND the slot algebra."""
    from hadoop_search_engine_spark.operators.evaluate import (
        balanced_interleave,
        run_from_batch,
    )
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk_batch,
    )

    ix = _oracle_index(spark, sf_dir)
    ra = run_from_batch(
        search_topk_batch(ix, BATCH_QUERIES, k=10, serving="spark"))
    rb = run_from_batch(
        search_topk_batch(ix, BATCH_QUERIES, k=10, serving="spark",
                          k1=0.9, b=0.25))
    return balanced_interleave(ra, rb, k=10)


def q_collapse_inner_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES collapse inner_hits over the real index: top-5 collapsed
    page on lang, each page group expanded to its top-3 docs from the
    FULL scored match set ('3 more from this site')."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    r = search_dsl(
        ix,
        {"query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
         "collapse": {"field": "lang",
                      "inner_hits": {"name": "x", "size": 3}},
         "size": 5},
        documents=docs,
    )
    return r.inner_hits["x"].select(
        "lang", "rank", "doc_id", F.round("score", 4).alias("score")
    )


def q_suggest_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-box autocomplete (operators/query_exec.py suggest_terms):
    terms with prefix 's' ranked by df — vocab-sized scan, never
    the postings; the indexed variant answers from the driver-cached
    lexicon with no Spark job (pytest-parity-checked)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        suggest_terms_dataframe,
    )

    docs = _read(spark, sf_dir, "documents")
    return suggest_terms_dataframe(docs.select("doc_id", "text"), "s", k=10)


def q_fuzzy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-correction candidates for the typo 'scann' (operators/
    query_exec.py fuzzy_terms): vocab terms within 1 Levenshtein edit,
    ranked (dist, df desc) — JVM levenshtein over the vocab-sized term
    table, never the corpus. The indexed variant answers from the
    driver-cached lexicon (pytest-parity-checked)."""
    from hadoop_search_engine_spark.operators.query_exec import (
        fuzzy_terms_dataframe,
    )

    docs = _read(spark, sf_dir, "documents")
    return fuzzy_terms_dataframe(docs.select("doc_id", "text"), "scann", max_edits=1, k=5)


def q_or_union_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR semantics of the reference search (search.service.js:58-90)
    as a set: distinct docs matching any query term."""
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    tf = term_frequencies(_read(spark, sf_dir, "documents"))
    return tf.where(F.col("term").isin(FLAGSHIP_TERMS)).select("doc_id").distinct()


def q_case_insensitive_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive term keys (utils/index.js:26): an upper-case
    query term still matches."""
    from hadoop_search_engine_spark.operators.index_build import term_frequencies

    tf = term_frequencies(_read(spark, sf_dir, "documents"))
    needle = F.lower(F.lit("SPARK"))
    return (
        tf.where(F.col("term") == needle)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
    )


# ---------------------------------------------------------------------------
# relational operator coverage (TPC-H-ish tables) — SURVEY §2.1-2.6
# ---------------------------------------------------------------------------

def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") < "1996-01-01") & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_partkey", "l_quantity")


def q_null_empty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-guard + empty-string filter (README.md:373-375 analog)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.where(F.col("text").isNotNull() & (F.col("text") != ""))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


def q_type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast-to-string term minting (README.md:386-388 analog)."""
    c = _read(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_custkey").cast("string"), F.lit("-"), F.col("c_mktsegment")).alias(
            "entity"
        ),
    )


def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch entity union (README.md:408-417 analog)."""
    c = _read(spark, sf_dir, "customer").select(
        F.col("c_name").alias("entity"), F.lit("customer").alias("kind")
    )
    s = _read(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("entity"), F.lit("supplier").alias("kind")
    )
    n = _read(spark, sf_dir, "nation").select(
        F.col("n_name").alias("entity"), F.lit("nation").alias("kind")
    )
    return c.unionByName(s).unionByName(n).groupBy("kind").agg(F.count("*").alias("n"))


def q_semi_join_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list semi-join + ORDER BY date DESC (README.md:531-536)."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    return (
        o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_semi")
        .select("o_orderkey", F.col("o_orderdate").cast("string").alias("o_date"), "o_totalprice")
        .orderBy(F.col("o_date").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


def q_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _read(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number-per-group (doc_id-minting window shape, SURVEY §2.5)."""
    from pyspark.sql import Window

    c = _read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# training-data-pipeline operators
# ---------------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"), n=3, threshold=0.12)


def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-shingle df cap active (the web-scale skew guard): Jaccard
    over the capped shingle sets."""
    from hadoop_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), n=3, threshold=0.1, max_shingle_df=20
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate grouping: connected components (alternating
    large-star/small-star) over the n-gram-Jaccard near-dup pairs —
    (doc_id, cluster_id=min id of the component). Oracle: a DuckDB
    recursive CTE computes min reachable id over the same pair set."""
    from hadoop_search_engine_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), n=3, threshold=0.12
    )
    return dup_clusters(pairs)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs — oracle-checked: shingle
    hashes are murmur3 (SQL-replayable via functions.hashes), the 64
    affine permutations replay with hugeint arithmetic (the uint64
    wraparound is part of the definition), and Spark's band-hash
    equality equals the oracle's band content equality."""
    from hadoop_search_engine_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), n_hashes=64, bands=16, threshold=0.3
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance — oracle-checked:
    the signatures are murmur3-based JVM expressions that replay
    exactly in DuckDB SQL (functions.hashes), and the banded candidate
    generation is complete by pigeonhole (pytest-verified), so the
    banded Spark result equals the oracle's brute-force Hamming join."""
    from hadoop_search_engine_spark.operators.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(_read(spark, sf_dir, "documents"), max_hamming=8)
    return out.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return cosine_topk(emb, list(qvec), k=ANN_K)


def q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.similarity import cosine_dup_pairs_exact

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return cosine_dup_pairs_exact(emb, threshold=0.8)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (embedding near-dup removal): scaled copies of
    vectors 3/7/11 planted under LOWER ids (same direction, cosine 1)
    so the originals get dropped — runs the PRODUCTION LSH-bucketed
    path; the DuckDB oracle replays the exact pairwise rule (they
    agree because same-direction dups share every sign bucket and the
    testdata has no natural pairs at 0.999)."""
    from hadoop_search_engine_spark.operators.similarity import semdedup

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    plant = emb.where(F.col("vec_id").isin([3, 7, 11])).select(
        (F.col("vec_id") - 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    df = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(plant)
    return (
        semdedup(df, threshold=0.999, method="lsh")
        .select("vec_id")
        .orderBy("vec_id")
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k — oracle-checked: the deterministic
    hyperplane family inlines into the DuckDB SQL as literals, and the
    multi-probe neighborhood is a bit_count(xor) <= n_probe_bits filter
    against the query vector's bucket."""
    from hadoop_search_engine_spark.operators.similarity import lsh_bucket_topk

    emb = _read(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return lsh_bucket_topk(emb, list(qvec), k=ANN_K, n_planes=6, n_probe_bits=2)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — oracle-checked END TO END, training included: the
    trainer is cross-engine reproducible (murmur3 seeding, 6-decimal
    centroid quantization per Lloyd iteration, scale-invariant argmax
    assignment), so the DuckDB oracle unrolls the same k-means
    iterations as SQL CTEs (_dd_ivf_sql) and lands on identical
    centroids, probes, candidates, and top-k."""
    from hadoop_search_engine_spark.operators.similarity import ivf_topk, ivf_train

    emb = _read(spark, sf_dir, "embeddings")
    centroids = ivf_train(emb, n_centroids=8, n_iters=2)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    return ivf_topk(emb, list(qvec), centroids, k=ANN_K, n_probe=4)


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — oracle-checked END TO END, per-
    subspace k-means training included (operators/similarity.py
    pq_train/pq_encode/pq_topk). Same cross-engine trainer contract
    as IVF: murmur3 seeding, 6-dp score quantization before every
    argmax, 6-dp centroid means per iteration — the DuckDB replay
    (_dd_pq_sql) runs the identical iterations in relational form
    ((sub, code, dim) centroid rows, no per-subspace unrolling) and
    lands on identical codebooks, codes, and ADC top-k."""
    from hadoop_search_engine_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=8, nbits=3, n_iters=2)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    enc = pq_encode(emb, cb)
    return pq_topk(enc, cb, list(qvec), k=ANN_K)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — oracle-checked END TO END: coarse Lloyd training,
    residual product-quantization training, encoding, probe prune,
    and base+ADC scoring all replay as one DuckDB CTE chain
    (_dd_ivfpq_sql). The FAISS IndexIVFPQ shape on Spark."""
    from hadoop_search_engine_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cents, cbs = ivfpq_train(emb, n_centroids=8, ivf_iters=2, m=8,
                             nbits=3, pq_iters=2)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    enc = ivfpq_encode(emb, cents, cbs)
    return ivfpq_topk(enc, cents, cbs, list(qvec), k=ANN_K, n_probe=4)


def q_exact_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.dedup import exact_dup_pairs

    return exact_dup_pairs(_read(spark, sf_dir, "documents"))


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.text_analysis import (
        bpe_ish_token_count,
    )

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count(F.col("text")).cast("long").alias("n_subwords")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.text_analysis import token_count

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.text_analysis import lang_id

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.text_analysis import quality_score

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint — oracle-checked: the token hash
    is murmur3 (Spark's hash()), replayed exactly in DuckDB SQL
    (functions.hashes.sql_murmur3_u32_duckdb)."""
    from hadoop_search_engine_spark.operators.text_analysis import fingerprint

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.multimodal import media_metadata

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return media_metadata(docs, payload_col="payload").select(
        "doc_id", "n_bytes", "media_type"
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: stubbed media decode (deterministic fake features)."""
    from hadoop_search_engine_spark.operators.multimodal import extract_media_features

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.col("text").cast("binary").alias("html"),
    )
    feats = extract_media_features(docs)
    # the driver's canonicalizer sorts columns, which can't hash an
    # array column — project features to a stable scalar string
    return feats.select(
        "url",
        "media_type",
        "n_bytes",
        "n_frames",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.round(x.cast("double"), 4).cast("string"))
        ).alias("features_str"),
    )


def q_media_features_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode on the oracle board (round 4): per doc a
    deterministic media payload is ENCODED as an actual container —
    16x16 8-bit grayscale PNG (even doc_id, pixel i = (doc_id*31+7i)
    mod 256) or 256-sample PCM-16 mono WAV (odd doc_id, sample i =
    ((doc_id*131+17i) mod 65536) - 32768) — then round-tripped through
    the pure-NumPy decoders (operators/multimodal.py decode_png /
    decode_wav, no PIL/ffmpeg) inside an Arrow mapInPandas batch, and
    reduced to float64 value statistics. DuckDB replays the pixel /
    sample formulas with generate_series: green certifies the whole
    encode -> container bytes -> decode -> features path numerically.
    JPEG/MP4 remain the honestly-gated NotImplementedError codecs."""
    import pandas as pd

    from hadoop_search_engine_spark.operators.multimodal import (
        MediaDecoder,
        decode_png,
        decode_wav,
        encode_png,
        encode_wav_pcm16,
        sniff_media_type,
    )

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    schema = (
        "doc_id long, media_type string, n_vals long, "
        "v_mean double, v_std double, v_min long, v_max long"
    )

    def run(batches):
        import numpy as np

        decoder = MediaDecoder.get(deterministic_fake=False)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                i = np.arange(256, dtype=np.int64)
                if did % 2 == 0:
                    px = ((did * 31 + 7 * i) % 256).astype(np.uint8)
                    payload = encode_png(px.reshape(16, 16))
                    vals = decode_png(payload).astype(np.float64).ravel()
                else:
                    s = ((did * 131 + 17 * i) % 65536 - 32768).astype(
                        np.int16
                    )
                    payload = encode_wav_pcm16(s)
                    _rate, dec = decode_wav(payload)
                    vals = dec.astype(np.float64).ravel()
                # the singleton's REAL dispatch also runs (n_frames +
                # 16-dim features) so the serving path is exercised
                decoder.decode(payload)
                rows.append((
                    did, sniff_media_type(payload), vals.size,
                    round(float(vals.mean()), 6),
                    round(float(vals.std()), 6),
                    int(vals.min()), int(vals.max()),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_type", "n_vals", "v_mean", "v_std",
                "v_min", "v_max",
            ])

    return docs.mapInPandas(run, schema=schema)


def q_blob_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range blob read (HTTP 206 analog, video.services.js:19-66);
    chunk bytes surfaced as md5 so the value-hash is type-stable."""
    from hadoop_search_engine_spark.operators.multimodal import blob_range

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    out = blob_range(docs, offset=10, length=100,
                     payload_col="payload", id_col="doc_id")
    return out.select(
        "doc_id", F.md5("chunk").alias("chunk_md5"), "chunk_len", "total_len"
    )


CURATE_ARGS = dict(min_tokens=5, max_tokens=100_000, min_quality=0.3,
                   langs=("en", "es"), near_threshold=0.5)


def q_curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data pipeline on the oracle board:
    annotate (tokens/lang/quality/fingerprint) -> filter -> exact dedup
    (md5 groupBy) -> near dedup (MinHash-LSH greedy drop). Every stage
    replays in DuckDB SQL, so the composed pipeline is value-hash
    checked, not just its pieces."""
    from hadoop_search_engine_spark.operators.curate import curate_corpus

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    out = curate_corpus(docs, **CURATE_ARGS)
    return out.select("doc_id", "n_tokens", "lang_pred", "quality",
                      "fingerprint")


def q_event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (batch form of the streaming
    operator in streaming/incremental.py)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("win_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram (calendar_interval=week) with empty-bucket
    gap filling — calendar units are variable-width, which the
    fixed-interval histogram facet cannot express; the oracle replays
    the Monday truncation and the 7-day grid."""
    from hadoop_search_engine_spark.operators.analytics import date_histogram

    ev = _read(spark, sf_dir, "events")
    h = date_histogram(ev, "ts", "week", min_doc_count=0)
    return h.select(
        F.unix_timestamp("bucket").alias("bucket_ts"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token windows (RAG / context prep): 32-token chunks
    with 8-token overlap; the oracle replays the step arithmetic and
    the list slicing per chunk."""
    from hadoop_search_engine_spark.operators.training import chunk_docs

    docs = _read(spark, sf_dir, "documents")
    return chunk_docs(docs, max_tokens=32, overlap=8)


def q_pack_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split packing lineage: which token range
    of which doc landed in which 128-token training bin, packed per
    lang group (so each group's window runs independently). The
    oracle replays the exclusive running-sum + floor-division span
    arithmetic exactly (pure integers)."""
    from hadoop_search_engine_spark.operators.training import pack_spans

    docs = _read(spark, sf_dir, "documents")
    return pack_spans(docs, 128, group_col="lang")


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin attention-boundary metadata (document-masking input):
    which docs start where inside each packed 128-token bin. Arrays
    ride as comma-joined strings for the cross-engine hash."""
    from hadoop_search_engine_spark.operators.training import pack_manifest

    docs = _read(spark, sf_dir, "documents")
    m = pack_manifest(docs, 128, group_col="lang")
    as_csv = lambda c: F.array_join(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("string")), ","
    )
    return m.select(
        "lang", "bin_id", "n_tokens",
        as_csv("doc_ids").alias("doc_ids_csv"),
        as_csv("doc_starts").alias("doc_starts_csv"),
    )


def q_pack_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed training rows: every bin exactly 128 tokens
    except each lang group's final partial bin; text is the
    space-joined token stream in doc_id concatenation order."""
    from hadoop_search_engine_spark.operators.training import pack_text

    docs = _read(spark, sf_dir, "documents")
    return pack_text(docs, 128, group_col="lang")


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-scored bigram collocations (phrase mining): adjacent-pair
    counts >= 5 with pointwise mutual information over the full bigram
    and token probability spaces; the oracle replays the bigram
    extraction, both totals, and the log-ratio at 6 dp."""
    from hadoop_search_engine_spark.operators.text_analysis import (
        collocations,
    )

    docs = _read(spark, sf_dir, "documents")
    return collocations(docs, min_count=5)


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification over the REAL block index's BM25 top-20
    window, lam=0.7, k=10 — the greedy relevance-vs-redundancy
    re-rank. The DuckDB oracle replays the whole contract: the BM25
    window, rel normalization, the pairwise-cosine matrix, and the
    greedy argmax itself as a recursive CTE carrying the picked list."""
    from hadoop_search_engine_spark.operators.hybrid import mmr_rerank

    ix = _oracle_index(spark, sf_dir)
    emb = _read(spark, sf_dir, "embeddings")
    return mmr_rerank(
        ix, " ".join(FLAGSHIP_TERMS), emb, k=10, window=20, lam=0.7
    )


def q_dsl_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_all through the DSL: every live doc at constant boost
    score in _doc order, top-25. The oracle is the plain ordered scan."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    return search_dsl(
        ix, {"query": {"match_all": {"boost": 2.0}}, "size": 25}
    ).hits


def q_dsl_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ids query through the DSL: live-id intersection at constant
    score (one absent id included to prove the intersection)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    return search_dsl(
        ix,
        {"query": {"ids": {"values": [3, 7, 11, 999_999_999]}},
         "size": 10},
    ).hits


def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-recipe epoch mixing: en x1.5, es x0.4, everything else
    x1.0 — each doc appears floor(w) times plus a deterministic
    murmur3(id:epoch)-bucketed fractional epoch. The oracle replays
    the stratum CASE, the epoch grid, and the bit-exact hash."""
    from hadoop_search_engine_spark.operators.curate import mix_corpus

    docs = _read(spark, sf_dir, "documents")
    out = mix_corpus(
        docs, {"en": 1.5, "es": 0.4}, strata_col="lang",
        default_weight=1.0,
    )
    return out.select("doc_id", "lang", "epoch")


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocab induction: the first 30 learned merges over
    the documents corpus (count desc, lexicographic ties). Iterative —
    each merge depends on the table rewritten by all previous merges —
    so this is a rows-only entry; correctness is pinned by the
    driver==spark identity test and a hand-derived Sennrich fixture
    (tests/test_bpe.py)."""
    from hadoop_search_engine_spark.operators.bpe import bpe_train

    docs = _read(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=30, mode="driver")


def q_bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE segmentation of every document with the 30-merge
    table (memoized per distinct word per Arrow batch). Rows-only —
    the encoder replays the iterative merge ranks; the reconstruction
    invariant (subwords always reconcatenate to word + '</w>') is
    pytest-pinned."""
    from hadoop_search_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = _read(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=30, mode="driver")
    return bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens")


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): hashed
    unigram+bigram bag log-likelihood ratio of target (lang='en')
    vs raw (everything), 1024 feature buckets, int64 micro-nats.
    The oracle replays the murmur feature hash, the add-one smoothed
    distributions, and the quantized per-feature log-ratios."""
    from hadoop_search_engine_spark.operators.dsir import dsir_weights

    docs = _read(spark, sf_dir, "documents")
    w = dsir_weights(
        docs, target_docs=docs.where(F.col("lang") == "en"),
        n_features=1024,
    )
    # stringified: the driver compare float-upcasts all-numeric rows
    # and 7+ digit int64s lose digits through %.6g
    return w.select(
        "doc_id", F.col("dsir_llq").cast("string").alias("dsir_llq")
    )


def q_dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-k selection (without-replacement importance
    resample at T=1): the 50 raw docs with the largest
    ``dsir_llq + gumbel(doc_id:'dsir')`` keys. The oracle replays the
    murmur-seeded uniform, the double-log Gumbel transform, and the
    quantized key ordering."""
    from hadoop_search_engine_spark.operators.dsir import dsir_select

    docs = _read(spark, sf_dir, "documents")
    sel = dsir_select(
        docs, target_docs=docs.where(F.col("lang") == "en"),
        k=50, n_features=1024, temperature=1.0, salt="dsir",
    )
    return sel.select(
        "doc_id", "lang",
        F.col("dsir_llq").cast("string").alias("dsir_llq"),
        F.col("key_llq").cast("string").alias("key_llq"),
    )


_CLS_NF, _CLS_ITERS, _CLS_LR = 256, 3, 0.5


def _classifier_weights_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_search_engine_spark.operators.classifier import (
        train_text_classifier,
    )

    docs = _read(spark, sf_dir, "documents").withColumn(
        "label", (F.col("lang") == "en").cast("long")
    )
    return train_text_classifier(
        docs, n_features=_CLS_NF, iters=_CLS_ITERS, lr=_CLS_LR
    )


def q_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality classifier (GPT-3 / CCNet style): logistic
    regression over hashed unigram+bigram PRESENCE features, trained
    by deterministic int64-quantized full-batch GD (label: lang='en').
    The oracle unrolls the 3 GD iterations as CTE chains — exact
    margins, quantized residuals, rounded updates — like the IVF
    trainer unrolls Lloyd iterations."""
    w = _classifier_weights_df(spark, sf_dir)
    return w.select("feature", F.col("wq").cast("string").alias("wq"))


def q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every doc with the trained classifier: exact int64 logit
    (micro-units) + sigmoid probability — the model-based quality gate
    a 100 TB crawl pipeline runs after heuristic curation."""
    from hadoop_search_engine_spark.operators.classifier import (
        score_text_classifier,
    )

    docs = _read(spark, sf_dir, "documents")
    w = _classifier_weights_df(spark, sf_dir)
    s = score_text_classifier(docs, w, n_features=_CLS_NF)
    return s.select(
        "doc_id",
        F.col("logit_micro").cast("string").alias("logit_micro"),
        "prob",
    )


def _derived_url_col() -> F.Column:
    """Deterministic noisy-URL column over documents (the testdata has
    no url column): mixed-case schemes/hosts, default ports, tracking
    params, trailing slashes, fragments — every normalization case.
    Mirrored bit-exactly in SQL by :func:`_derived_url_sql`."""
    d = F.col("doc_id")
    host = (
        F.when(d % 6 == 0, F.lit("A.Example.COM"))
        .when(d % 6 == 1, F.lit("WWW.News.co.uk"))
        .when(d % 6 == 2, F.lit("cdn.news.CO.UK"))
        .when(d % 6 == 3, F.lit("x.org"))
        .when(d % 6 == 4, F.lit("deep.a.blog.co.uk"))
        .otherwise(F.lit("Big.Site.com"))
    )
    return F.concat(
        F.when(d % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("https://")),
        host,
        F.when(d % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"),
        (d % 37).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(d % 4 == 1, F.lit("?b=2&a=1"))
        .when(d % 4 == 2, F.lit("?gclid=1"))
        .otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("#f")).otherwise(F.lit("")),
    )


_DERIVED_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END || "
    "CASE doc_id % 6 WHEN 0 THEN 'A.Example.COM' "
    "WHEN 1 THEN 'WWW.News.co.uk' WHEN 2 THEN 'cdn.news.CO.UK' "
    "WHEN 3 THEN 'x.org' WHEN 4 THEN 'deep.a.blog.co.uk' "
    "ELSE 'Big.Site.com' END || "
    "CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END || "
    "'/p/' || (doc_id % 37)::varchar || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || "
    "CASE doc_id % 4 WHEN 0 THEN '?utm_source=x&b=2&a=1' "
    "WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?gclid=1' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN '#f' ELSE '' END)"
)


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization: lowercase scheme/host, default-port
    strip, fragment drop, tracking-param drop + byte-sort, trailing-
    slash strip — pure expressions, oracle replays each step."""
    from hadoop_search_engine_spark.operators.urltools import normalize_url

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_url(_derived_url_col()).alias("url_norm"),
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: one survivor (lowest doc_id) per
    normalized strip-www URL — partial-agg min winner + id semi-join,
    the skew-safe shape (vs a window per hot URL)."""
    from hadoop_search_engine_spark.operators.urltools import url_dedup

    docs = _read(spark, sf_dir, "documents")
    out = url_dedup(docs.withColumn("url", _derived_url_col()))
    return out.select("url_norm", "doc_id")


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain census (docs, bytes, share): host →
    public-suffix-aware domain, one groupBy + broadcast total."""
    from hadoop_search_engine_spark.operators.urltools import domain_stats

    docs = _read(spark, sf_dir, "documents")
    return domain_stats(docs.withColumn("url", _derived_url_col()))


def q_cap_per_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain diversity cap: keep <= 3 docs per registrable domain
    by deterministic salted-murmur rank (unbiased, engine-replayable);
    the oracle replays the hash and the window."""
    from hadoop_search_engine_spark.operators.urltools import cap_per_domain

    docs = _read(spark, sf_dir, "documents")
    out = cap_per_domain(docs.withColumn("url", _derived_url_col()), 3)
    return out.select("doc_id")


def q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature (saturation, explicit pivot): BM25 + 1.2 *
    (n_chars / (n_chars + 800)) — the pagerank/popularity fusion
    clause; the oracle replays both branches and the 4/6 dp contract."""
    from hadoop_search_engine_spark.operators.hybrid import (
        rank_feature_topk,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    return rank_feature_topk(
        ix, " ".join(FLAGSHIP_TERMS), docs, "n_chars",
        fn="saturation", pivot=800.0, boost=1.2, k=20,
    )


def q_simple_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES simple_query_string with -negation: compiles to the boolean
    engine ("(spark OR query) NOT vector") — the search-box syntax."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    out = search_dsl(
        ix,
        {"query": {"simple_query_string": {
            "query": "spark query -vector"}}, "size": 20},
    ).hits
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES missing agg over the indexed hit set (derived sparse column:
    lang only on doc_id %% 3 == 0)."""
    from hadoop_search_engine_spark.operators.analytics import missing_facet
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").withColumn(
        "maybe", F.when(F.col("doc_id") % 3 == 0, F.col("lang"))
    )
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return missing_facet(m, docs, "maybe")


def q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks (exact inverse percentiles) of n_chars at
    500 and 1500 over the indexed hit set."""
    from hadoop_search_engine_spark.operators.analytics import (
        percentile_ranks_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return percentile_ranks_facet(m, docs, "n_chars", (500.0, 1500.0))


def q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix: named segments + pairwise intersections in
    one conditional-agg pass."""
    from hadoop_search_engine_spark.operators.analytics import (
        adjacency_matrix_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return adjacency_matrix_facet(
        m, docs,
        {"en": "lang = 'en'", "long": "n_chars >= 1500",
         "short": "n_chars < 500"},
    )


def q_snippet_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-fragment highlighting over the indexed top-20: one window
    per matching query term (distinct starts, document order, capped
    at 3), pure expressions; oracle replays with strpos +
    list_transform."""
    from hadoop_search_engine_spark.operators.query_exec import (
        search_topk,
        snippet_fragments,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    top = search_topk(ix, " ".join(FLAGSHIP_TERMS), k=20)
    return snippet_fragments(top, docs, FLAGSHIP_TERMS, width=30)


def q_url_pattern_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL-pattern blocklist: derived URLs cycle through search/
    tag/login/article/feed endpoints; only the article pages survive
    the default pattern filter — both engines derive and filter with
    the same regexes."""
    from hadoop_search_engine_spark.operators.urltools import (
        url_pattern_filter,
    )

    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".com"),
        F.when(d % 5 == 0, F.lit("/tags/py/"))
        .when(d % 5 == 1, F.lit("/?s=find"))
        .when(d % 5 == 2, F.lit("/login"))
        .when(d % 5 == 3, F.concat(F.lit("/article/"), d.cast("string")))
        .otherwise(F.lit("/feed/")),
    )
    docs = _read(spark, sf_dir, "documents").withColumn("url", url)
    return url_pattern_filter(docs).select("doc_id", "url")


def q_multi_match_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match type=cross_fields (term-centric): per query term
    the BEST weighted per-field BM25 contribution, summed as exact
    decimals (order-independent) — the treat-fields-as-one-logical-
    field semantics most_fields/best_fields can't express. Same
    derived text+source field pair as multifield_search."""
    import hashlib

    from hadoop_search_engine_spark.operators.index_build import build_index
    from hadoop_search_engine_spark.operators.multifield import (
        cross_fields_topk,
    )
    from hadoop_search_engine_spark.operators.query_exec import Index

    ix_text = _oracle_index(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = f"/tmp/hse_entry_srcidx_{tag}"
    if not (
        os.path.exists(os.path.join(d, "stats.json"))
        and os.path.exists(os.path.join(d, "lexicon", "_SUCCESS"))
    ):
        src_docs = _read(spark, sf_dir, "documents").select(
            "doc_id", F.col("source").alias("text")
        )
        build_index(spark, src_docs, d, n_buckets=4)
    ix_src = Index.load(spark, d)
    return cross_fields_topk(
        [(ix_text, 1.0), (ix_src, 2.0)], "spark src1", k=20
    )


def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured log processing: extract a JSON field from the
    events props column (Spark get_json_object — JVM-side JSON path,
    no UDF) and aggregate per event_type; the oracle replays with
    DuckDB's json_extract_string. The clickstream-props surface every
    log pipeline needs."""
    events = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull() & (F.col("k") >= 10))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_terms_agg_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg page semantics: top-3 buckets by (count desc, key
    asc) — a TakeOrdered over the bucket aggregate."""
    from hadoop_search_engine_spark.operators.query_exec import (
        facet_counts,
        matched_docs,
    )

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return facet_counts(m, docs, ["lang"], size=3)


def q_span_first_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene/ES span_first: the data-derived flagship phrase must END
    within the first 8 tokens — the oracle adds the position bound to
    the phrase window filter (the adjacency index i IS the 0-based
    position of the phrase's last token)."""
    from hadoop_search_engine_spark.operators.query_exec import phrase_search

    ix = _oracle_index(spark, sf_dir, positions=True)
    top = phrase_search(ix, _flagship_phrase(spark, sf_dir), k=20,
                        first_end=8)
    return top.select("doc_id", F.round("score", 4).alias("score"))


def q_function_score_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score random_score: reproducible pseudo-random
    factor in [0, 1) from a salted murmur3 of doc_id over 2^32 —
    deterministic jitter, bit-replayed by the oracle's murmur chain."""
    from hadoop_search_engine_spark.operators.hybrid import function_score

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    return function_score(
        ix, " ".join(FLAGSHIP_TERMS), docs, k=10,
        random_score={"seed": 7},
    )


def q_dsl_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this through the DSL — identical compile target to
    the direct call, same SQL oracle (doc 0, top-3 tf*idf terms)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    out = search_dsl(
        ix,
        {"query": {"more_like_this": {"like": [{"_id": 0}],
                                      "max_query_terms": 3}},
         "size": 10},
        documents=docs,
    ).hits
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range QUERY (query context): constant-score metadata range
    over live docs in _doc order."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    return search_dsl(
        ix,
        {"query": {"range": {"n_chars": {"gte": 500, "lt": 1500,
                                         "boost": 2.0}}}, "size": 40},
        documents=docs,
    ).hits


def q_dsl_bool_structured_filtered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Term-structured ES bool (must + score-only should + must_not)
    COMPOSED with a non-scoring metadata range filter — the boolean
    engine scores the full eligible set (per-shard cut disabled for
    filter-exactness), the metadata frame semi-joins, then top-k. The
    round's previously-documented DSL gap, now closed and oracled."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    out = search_dsl(
        ix,
        {"query": {"bool": {
            "must": [{"term": {"text": "spark"}}],
            "should": [{"term": {"text": "query"}},
                       {"term": {"text": "merge"}}],
            "must_not": [{"term": {"text": "vector"}}],
            "filter": [{"range": {"n_chars": {"gte": 300}}}],
        }}, "size": 20},
        documents=docs,
    ).hits
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget cut: the maximal prefix of the
    (murmur3(id:budget), id) order fitting 20k tokens — the "cut this
    mix to N tokens" op; the oracle replays the hash, the exclusive
    running sum, and the prefix predicate."""
    from hadoop_search_engine_spark.operators.curate import (
        token_budget_cut,
    )

    docs = _read(spark, sf_dir, "documents")
    return token_budget_cut(docs, 20_000).select("doc_id", "n_tokens")


_SPAN_APPENDIX = " zz boiler marker span words end extra tail"


def q_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span census (Lee et al. 2022 signal): an
    8-token boilerplate appendix is added to EVERY doc in both
    engines, so each doc shares three 6-gram occurrences with the
    corpus; keep-first = min (doc_id, pos). The oracle replays the
    gram enumeration (parallel unnest + list_slice), the winner
    window, and the per-doc rollup on gram STRINGS (the Spark side
    keys by a salted murmur pair — identical classes absent
    collisions)."""
    from hadoop_search_engine_spark.operators.dedup import (
        duplicate_span_stats,
    )

    docs = _read(spark, sf_dir, "documents").withColumn(
        "text", F.concat("text", F.lit(_SPAN_APPENDIX))
    )
    return duplicate_span_stats(docs, n=6)


def q_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span REMOVAL: tokens covered by non-first duplicate
    6-gram occurrences are cut and the text rebuilt in token order;
    the lowest (doc_id, pos) occurrence of the appendix survives in
    exactly one document."""
    from hadoop_search_engine_spark.operators.dedup import (
        drop_duplicate_spans,
    )

    docs = _read(spark, sf_dir, "documents").withColumn(
        "text", F.concat("text", F.lit(_SPAN_APPENDIX))
    )
    return drop_duplicate_spans(docs, n=6)


def q_composite_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation with keyset pagination over the indexed
    hit set: (lang, 500-wide n_chars bucket) sources, page size 4 —
    page ONE is collected and page TWO is returned, proving the
    after-key resume. The oracle ranks all buckets in composite-key
    order and selects rows 5..8 (keyset page 2 == offset page 2 by the
    strict key ordering)."""
    from hadoop_search_engine_spark.operators.analytics import (
        composite_agg_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    sources = [("lang", "terms", "lang"),
               ("len_bucket", "histogram", "n_chars", 500.0)]
    page1 = composite_agg_facet(m, docs, sources, size=4).collect()
    after = (page1[-1]["lang"], page1[-1]["len_bucket"])
    return composite_agg_facet(m, docs, sources, size=4, after=after)


def q_terms_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation with metric sub-aggregations (avg/sum/max/
    cardinality) per lang bucket over the indexed hit set — one
    partial-aggregated groupBy pass."""
    from hadoop_search_engine_spark.operators.analytics import (
        terms_metrics_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return terms_metrics_facet(
        m, docs, "lang",
        {"avg_len": ("avg", "n_chars"), "sum_len": ("sum", "n_chars"),
         "max_len": ("max", "n_chars"), "n_sources": ("cardinality",
                                                      "source")},
    )


def q_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats over the indexed hit set: ES's naive-formula
    variance/std fields derived from (count, sum, sum of squares) —
    engine-replayable because the formula defines the result."""
    from hadoop_search_engine_spark.operators.analytics import (
        extended_stats_facet,
    )
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return extended_stats_facet(m, docs, "n_chars")


def q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters aggregation: named (possibly overlapping) predicate
    buckets counted in one conditional-aggregation pass."""
    from hadoop_search_engine_spark.operators.analytics import filters_facet
    from hadoop_search_engine_spark.operators.query_exec import matched_docs

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    m = matched_docs(ix, " ".join(FLAGSHIP_TERMS))
    return filters_facet(
        m, docs,
        {"en": "lang = 'en'", "long": "n_chars >= 1500",
         "short": "n_chars < 500"},
    )


def q_dsl_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES dis_max through the DSL: best_fields combine (max +
    tie_breaker * rest) of two match-family branches' FULL scored
    match sets; oracle replays both branch BM25 sums and the combine."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    out = search_dsl(
        ix,
        {"query": {"dis_max": {
            "queries": [{"match": {"text": "spark query"}},
                        {"term": {"text": "table"}}],
            "tie_breaker": 0.3}}, "size": 100_000},
    ).hits
    return _quantized_topk(out, k=20)


def q_dsl_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query through the DSL: positive matches keep their
    BM25 score unless they also match the negative query (× 0.4
    demotion — not exclusion)."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    out = search_dsl(
        ix,
        {"query": {"boosting": {
            "positive": {"match": {"text": "spark query"}},
            "negative": {"term": {"text": "table"}},
            "negative_boost": 0.4}}, "size": 20},
    ).hits
    return out.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES constant_score through the DSL: filter-context match at a
    fixed boost, _doc order — recall without scoring."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    return search_dsl(
        ix,
        {"query": {"constant_score": {
            "filter": {"match": {"text": "spark query"}},
            "boost": 2.5}}, "size": 30},
    ).hits


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) container round-trip on the oracle board:
    documents → deterministic member-per-record ``.warc.gz`` export →
    distributed ``read_warc`` parse → per-url md5 of the recovered
    payload, vs DuckDB reconstructing the identical html string. Green
    means the from-scratch container writer+parser preserves every
    payload byte — the Common-Crawl-style ingest path of the north
    star. Reference analog: raw-input staging onto HDFS
    (processVideo/upload_videos_to_hive.py:16-36)."""
    import hashlib

    from hadoop_search_engine_spark.sources.warc import export_warc, read_warc

    # cache tag = path + CONTENT fingerprint of the documents table
    # (file names/sizes/mtimes): regenerating the corpus at the same
    # path invalidates the cached archives, so the Spark side never
    # replays stale WARCs against a fresh-corpus oracle
    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    src = os.path.join(sf_dir, "documents.parquet")
    paths = (
        sorted(
            os.path.join(r, fn)
            for r, _, fns in os.walk(src) for fn in fns
        )
        if os.path.isdir(src) else [src]
    )
    for p in paths:
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}"
                 .encode())
    tag = h.hexdigest()[:12]
    d = f"/tmp/hse_entry_warc_{tag}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        docs = _read(spark, sf_dir, "documents").select(
            F.concat(
                F.lit("https://site.example/page/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.expr(
                "timestamp'2025-01-01 00:00:00'"
                " + make_interval(0, 0, 0, 0, 0, 0, doc_id)"
            ).alias("warc_ts"),
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
        )
        export_warc(docs, d, n_files=4)
        open(marker, "w").close()
    return (
        read_warc(spark, d, glob="*.warc.gz")
        .select(
            "url",
            F.md5("html").alias("html_md5"),
            F.col("http_status").cast("long").alias("http_status"),
            "mime",
        )
        .orderBy("url")
    )


def q_fold_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASCII-folding analyzer on the oracle board: accent the corpus
    deterministically (translate aeiou→áéíöü), tokenize + fold, and
    DuckDB replays the identical fixed fold table (Lucene
    ASCIIFoldingFilter semantics, functions/analyzer.py). Folding is
    translate()+replace() in all three engines — JVM-side,
    whole-stage-codegen, no Python on the hot path."""
    from hadoop_search_engine_spark.functions.analyzer import (
        analyze_tokens_col,
    )

    docs = _read(spark, sf_dir, "documents")
    accented = F.translate(F.col("text"), "aeiou", "áéíöü")
    toks = analyze_tokens_col(tokens_col(accented), fold=True)
    return docs.select("doc_id", F.explode(toks).alias("term"))


def q_cjk_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CJK bigram analyzer (Lucene CJKAnalyzer semantics) on the
    oracle board: map the corpus digits onto Han characters
    deterministically, run the REAL analyzer chain
    (analyzed_text_col(cjk=True) — the same Arrow pandas UDF the index
    build uses), and DuckDB enumerates the overlapping bigrams with
    substr arithmetic."""
    from hadoop_search_engine_spark.functions.analyzer import (
        analyzed_text_col,
    )

    docs = _read(spark, sf_dir, "documents")
    han = F.translate(
        F.regexp_replace(F.col("text"), "[^a-z]", ""),
        "abcdefghijklmnopqrstuvwxyz",
        "一二三四五六七八九十百千万億兆京垓春夏秋冬山川田月",
    )
    s = F.substring(han, 1, 12)
    analyzed = analyzed_text_col(s, cjk=True)
    return (
        docs.select("doc_id", s.alias("s"), analyzed.alias("a"))
        .where(F.length("s") >= 2)
        .select(
            "doc_id", F.posexplode(F.split(F.col("a"), " ")).alias("pos", "bigram")
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "bigram")
    )


def q_dsl_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime_mappings on the oracle board: a script-defined field
    (kchars = n_chars/1000, ast-compiled painless subset) used as a
    bool.filter range over the indexed search — same SQL shape as
    filtered_search with the equivalent integer predicate."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    res = search_dsl(
        ix,
        {
            "runtime_mappings": {
                "kchars": {
                    "type": "double",
                    "script": {"source": "emit(doc['n_chars'].value / 100)"},
                }
            },
            "query": {"bool": {
                "must": [{"match": {"text": " ".join(FLAGSHIP_TERMS)}}],
                "filter": [{"range": {"kchars": {"gte": 3.0}}}],
            }},
            "size": 20,
        },
        documents=docs,
    )
    return res.hits.select("doc_id", F.round("score", 4).alias("score"))


def q_dsl_script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_score on the oracle board: BM25 match rescored by the
    ast-compiled painless subset (`_score * doc['n_chars'].value /
    1000`) — DuckDB recomputes the same arithmetic over the scored
    CTE."""
    from hadoop_search_engine_spark.operators.dsl import search_dsl

    ix = _oracle_index(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents")
    res = search_dsl(
        ix,
        {"query": {"script_score": {
            "query": {"match": {"text": " ".join(FLAGSHIP_TERMS)}},
            "script": {"source": "_score * doc['n_chars'].value / 1000"},
        }}, "size": 20},
        documents=docs,
    )
    return res.hits.select("doc_id", F.round("score", 4).alias("score"))


_INGEST_PIPE = [
    {"gsub": {"field": "text", "pattern": "[0-9]+", "replacement": "#"}},
    {"substring": {"field": "text", "start": 1, "length": 60}},
    {"uppercase": {"field": "lang"}},
    {"set": {"field": "source", "value": "pipeline"}},
    {"convert": {"field": "n_chars", "type": "double"}},
    {"copy": {"from": "lang", "to": "lang2"}},
]


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style ingest pipeline (operators/ingest.py): the SAME JSON
    processor list compiles to the Spark Column chain AND the DuckDB
    SELECT — declarative pre-index ETL, Catalyst-fused, no Python."""
    from hadoop_search_engine_spark.operators.ingest import apply_pipeline

    return apply_pipeline(
        _read(spark, sf_dir, "documents"), _INGEST_PIPE
    ).orderBy("doc_id")


def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link extraction on the oracle board: deterministic hrefs
    injected into reconstructed html (each page links to the next two
    doc_ids mod N, plus a mailto and a fragment dup that must drop),
    extracted by the JVM regexp path (operators/urltools.py
    extract_links) — DuckDB replays with regexp_extract_all."""
    from hadoop_search_engine_spark.operators.urltools import extract_links

    docs = _read(spark, sf_dir, "documents")
    n = docs.count()
    u = F.concat(F.lit("https://site.example/page/"),
                 F.col("doc_id").cast("string"))
    nxt = F.concat(F.lit("https://site.example/page/"),
                   ((F.col("doc_id") + 1) % n).cast("string"))
    nxt2 = F.concat(F.lit("https://site.example/page/"),
                    ((F.col("doc_id") + 2) % n).cast("string"))
    html = F.encode(
        F.concat(
            F.lit('<html><body><a href="'), nxt, F.lit('">n</a>'),
            F.lit('<a href="'), nxt2, F.lit('#frag">n2</a>'),
            F.lit('<a href="mailto:x@y">m</a>'),
            F.lit('<a href="/rel">r</a></body></html>'),
        ),
        "UTF-8",
    )
    pages = docs.select(u.alias("url"), html.alias("html"))
    return extract_links(pages).orderBy("src", "dst")


_LTR_MODEL = {
    # a FIXED literal model (training is driver-side and pytest-gated;
    # what the oracle certifies is the SCORING path: standardization +
    # sigmoid + per-query window rank, operators/ltr.py)
    "feature_cols": ["bm25", "n_chars"],
    "weights": [1.2, -0.4],
    "bias": 0.1,
    "means": [2.0, 300.0],
    "stds": [1.5, 120.0],
}


def q_ltr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR reranking on the oracle board: BM25 features from the REAL
    indexed full-match-set scorer + a metadata feature, scored by a fixed
    pointwise model (sigmoid over standardized features — one JVM
    Column) and cut per query by a rank window; DuckDB recomputes the
    identical arithmetic."""
    from pyspark.sql import Window

    from hadoop_search_engine_spark.operators.ltr import ltr_score_col
    from hadoop_search_engine_spark.operators.query_exec import scored_docs

    docs = _read(spark, sf_dir, "documents")
    ix = _oracle_index(spark, sf_dir)
    full = scored_docs(ix, " ".join(FLAGSHIP_TERMS))
    feats = (
        # bm25 quantized to 6 dp BEFORE the model: makes the feature
        # bit-identical cross-engine (raw distributed sums agree only
        # to ~1e-10), so the sigmoid and the rank replay exactly
        full.select("doc_id", F.round("score", 6).alias("bm25"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("query_id", F.lit("q1"))
    )
    scored = feats.select(
        "query_id", "doc_id",
        F.round(ltr_score_col(_LTR_MODEL), 6).alias("ltr_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ltr_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
    )


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigrams (Wimbd headline analysis): one scan,
    map-side partial agg, TakeOrderedAndProject."""
    from hadoop_search_engine_spark.operators.text_analysis import top_ngrams

    return top_ngrams(_read(spark, sf_dir, "documents"), n=2, k=50)


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ln(freq)~ln(rank) least-squares over the vocabulary (Zipf
    health probe): regr_* aggregates both engines."""
    from hadoop_search_engine_spark.operators.text_analysis import zipf_fit

    return zipf_fit(_read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Stable certification core (VERDICT r03 #2): the driver's hard
# correctness signal covers only the FIRST 50 queries() entries, so
# this prefix is pinned — one representative per SURVEY §2 family,
# the flagship indexed/serving paths, the dedup/ANN belt, and every
# entry whose code changed this round. KEEP THIS LIST STABLE across
# rounds; new work goes after it (or swaps in deliberately, with the
# displaced entry still certified below the fold).
# ---------------------------------------------------------------------------
_CERT_PREFIX = [
    # flagship index build + search core (§2.4-2.6)
    "explode_tokens", "term_frequencies", "doc_stats", "corpus_stats",
    "inverted_index", "lexicon", "bm25_topk", "bm25_topk_and",
    "bm25_topk_indexed", "bm25_topk_indexed_driver",
    "filtered_search_indexed", "phrase_search_indexed",
    # §2 relational basics (scan/filter/cast/joins/union/windows)
    "scan_project_filter", "null_empty_guard", "type_cast",
    "distinct_pairs", "union_by_name", "semi_join_orderby",
    "broadcast_join_agg", "orderby_limit", "window_topk_per_group",
    "tpch_q1", "json_props_agg", "date_histogram",
    # reference-compat + serving paths
    "or_union_docs", "or_union_indexed", "case_insensitive_lookup",
    "sorted_search", "paginated_search", "bm25_topk_batch_50",
    "time_range_search", "percolate_stream",
    # sources / ingest (§2.2-2.3)
    "warc_ingest", "blob_range", "ingest_pipeline",
    "multimodal_metadata",
    # dedup / ANN belt (LLM-pipeline first-class components)
    "exact_dedup", "minhash_lsh", "simhash", "ngram_jaccard",
    "dup_clusters", "semdedup", "ann_lsh", "ann_ivfpq",
    # DSL + multi-field
    "dsl_match", "dsl_bool", "multi_match_best_fields",
    # curation / text analysis (round-4-touched entries included)
    "pii_redact", "pii_census", "stratified_sample",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = _all_queries()
    missing = [k for k in _CERT_PREFIX if k not in all_q]
    if missing or len(_CERT_PREFIX) != 50:
        raise RuntimeError(
            f"certification prefix broken: {len(_CERT_PREFIX)} entries, "
            f"missing {missing}"
        )
    out = {k: all_q[k] for k in _CERT_PREFIX}
    out.update({k: v for k, v in all_q.items() if k not in out})
    return out


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # search-engine surface
        "explode_tokens": q_explode_tokens,
        "term_frequencies": q_term_frequencies,
        "doc_stats": q_doc_stats,
        "corpus_stats": q_corpus_stats,
        "inverted_index": q_inverted_index,
        "lexicon": q_lexicon,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_and": q_bm25_topk_and,
        "filtered_search": q_filtered_search,
        "bm25_topk_indexed": q_bm25_topk_indexed,
        "bm25_topk_indexed_driver": q_bm25_topk_indexed_driver,
        "bm25_topk_indexed_and": q_bm25_topk_indexed_and,
        "bm25_topk_impact": q_bm25_topk_impact,
        "lm_dirichlet_topk": q_lm_dirichlet_topk,
        "lm_dirichlet_topk_driver": q_lm_dirichlet_topk_driver,
        "tfidf_classic_topk": q_tfidf_classic_topk,
        "boolean_sim_topk": q_boolean_sim_topk,
        "match_scores_all": q_match_scores_all,
        "time_range_search": q_time_range_search,
        "dsl_match": q_dsl_match,
        "dsl_bool": q_dsl_bool,
        "dsl_filtered": q_dsl_filtered,
        "dsl_function_score": q_dsl_function_score,
        "dsl_collapsed": q_dsl_collapsed,
        "dsl_knn": q_dsl_knn,
        "multi_match_most_fields": q_multi_match_most_fields,
        "combined_fields": q_combined_fields,
        "multi_match_best_fields": q_multi_match_best_fields,
        "function_score_gauss": q_function_score_gauss,
        "function_score_fvf": q_function_score_fvf,
        "analyzed_tokens": q_analyzed_tokens,
        "bm25_topk_analyzed": q_bm25_topk_analyzed,
        "bm25_topk_analyzed_driver": q_bm25_topk_analyzed_driver,
        "phrase_search_analyzed": q_phrase_search_analyzed,
        "phrase_prefix_search": q_phrase_prefix,
        "doc_term_vectors": q_doc_term_vectors,
        "bm25_topk_rows": q_bm25_topk_rows,
        "bm25_topk_tuned": q_bm25_topk_tuned,
        "term_boosted_search": q_term_boosted_search,
        "msm_search": q_msm_search,
        "filtered_search_indexed": q_filtered_search_indexed,
        "phrase_search_indexed": q_phrase_indexed,
        "phrase_search_indexed_spark": q_phrase_indexed_spark,
        "train_val_split": q_train_val_split,
        "stratified_sample": q_stratified_sample,
        "contamination": q_contamination,
        "decontaminated": q_decontaminated,
        "line_dedup_drop_all": q_line_dedup_drop_all,
        "line_dedup_keep_first": q_line_dedup_keep_first,
        "pii_redact": q_pii_redact,
        "pii_census": q_pii_census,
        "repetition_stats": q_repetition_stats,
        "repetition_filtered": q_repetition_filtered,
        "lm_perplexity": q_lm_perplexity,
        "lm_ppl_filtered": q_lm_ppl_filtered,
        "lm_suggest_phrase": q_lm_suggest_phrase,
        "corpus_mix_report": q_corpus_mix_report,
        "session_stats": q_session_stats,
        "event_transitions": q_event_transitions,
        "pagerank": q_pagerank,
        "stream_sessions": q_stream_sessions,
        "ann_int8": q_ann_int8,
        "hybrid_search": q_hybrid_search,
        "rescore_search": q_rescore_search,
        "prefix_search_indexed": q_prefix_search,
        "wildcard_search_indexed": q_wildcard_search,
        "regexp_search_indexed": q_regexp_search,
        "pinned_search": q_pinned_search,
        "sorted_search": q_sorted_search,
        "paginated_search": q_paginated_search,
        "tfidf_top_terms": q_tfidf_top_terms,
        "ranking_metrics": q_ranking_metrics,
        "bm25_topk_resharded": q_bm25_topk_resharded,
        "multifield_search": q_multifield_search,
        "boosted_search": q_boosted_search,
        "decay_search": q_decay_search,
        "fuzzy_search_indexed": q_fuzzy_search_indexed,
        "bm25_topk_pruned": q_bm25_topk_pruned,
        "more_like_this": q_more_like_this,
        "explain_score": q_explain_score,
        "proximity_search_indexed": q_proximity_indexed,
        "proximity_search_indexed_spark": q_proximity_indexed_spark,
        "near_search_indexed": q_near_search,
        "near_search_indexed_spark": q_near_search_spark,
        "boolean_search": q_boolean_search,
        "boolean_search_indexed": q_boolean_search_indexed,
        "boolean_search_indexed_driver": q_boolean_search_indexed_driver,
        "bm25_topk_batch": q_bm25_topk_batch,
        "bm25_topk_batch_driver": q_bm25_topk_batch_driver,
        "bm25_topk_batch_50": q_bm25_topk_batch_50,
        "bm25_topk_batch_impact": q_bm25_topk_batch_impact,
        "federated_search": q_federated_search,
        "federated_batch": q_federated_batch,
        "facet_counts_indexed": q_facet_counts_indexed,
        "histogram_facets": q_histogram_facets,
        "range_facets": q_range_facets,
        "rare_terms": q_rare_terms_facet,
        "rollup_range": q_rollup_range,
        "rollup_refresh": q_rollup_refresh,
        "pipeline_aggs": q_pipeline_aggs,
        "bucket_script": q_bucket_script,
        "max_bucket": q_max_bucket,
        "terms_order_metric": q_terms_order_metric,
        "terms_filtered": q_terms_filtered,
        "top_metrics": q_top_metrics,
        "date_range_agg": q_date_range_agg,
        "multi_terms_agg": q_multi_terms_agg,
        "weighted_avg_metric": q_weighted_avg_metric,
        "dsl_range_agg": q_dsl_range_agg,
        "stats_facet": q_stats_facet,
        "percentiles_facet": q_percentiles_facet,
        "cardinality_facet": q_cardinality_facet,
        "top_hits_facet": q_top_hits_facet,
        "term_stats": q_term_stats,
        "snippets_indexed": q_snippets_indexed,
        "collapsed_search_indexed": q_collapsed_search_indexed,
        "suggest_terms_indexed": q_suggest_terms_indexed,
        "fuzzy_terms_indexed": q_fuzzy_terms_indexed,
        "or_union_indexed": q_or_union_indexed,
        "search_count": q_search_count,
        "significant_terms": q_significant_terms,
        "percolate": q_percolate,
        "percolate_stream": q_percolate_stream,
        "facet_counts": q_facet_counts,
        "snippets": q_snippets,
        "collapsed_search": q_collapsed_search,
        "collapse_inner_hits": q_collapse_inner_hits,
        "interleave_runs": q_interleave_runs,
        "significant_terms_bg": q_significant_terms_bg,
        "cohort_retention": q_cohort_retention,
        "funnel_counts": q_funnel_counts,
        "bucket_anomalies": q_bucket_anomalies,
        "suggest_terms": q_suggest_terms,
        "fuzzy_terms": q_fuzzy_terms,
        "or_union_docs": q_or_union_docs,
        "case_insensitive_lookup": q_case_insensitive_lookup,
        # relational operator coverage
        "scan_project_filter": q_scan_project_filter,
        "null_empty_guard": q_null_empty_guard,
        "type_cast": q_type_cast,
        "distinct_pairs": q_distinct_pairs,
        "union_by_name": q_union_by_name,
        "semi_join_orderby": q_semi_join_orderby,
        "broadcast_join_agg": q_broadcast_join_agg,
        "tpch_q1": q_tpch_q1,
        "orderby_limit": q_orderby_limit,
        "window_topk_per_group": q_window_topk_per_group,
        # training-data pipeline
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "dup_clusters": q_dup_clusters,
        "ngram_jaccard_capped": q_ngram_jaccard_capped,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        "semdedup": q_semdedup,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivfpq": q_ann_ivfpq,
        "exact_dup_pairs": q_exact_dup_pairs,
        "bpe_token_count": q_bpe_token_count,
        "token_count": q_token_count,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "multimodal_metadata": q_multimodal_metadata,
        "media_features": q_media_features,
        "media_features_decoded": q_media_features_decoded,
        "blob_range": q_blob_range,
        "warc_ingest": q_warc_ingest,
        "fold_tokens": q_fold_tokens,
        "cjk_bigrams": q_cjk_bigrams,
        "top_ngrams": q_top_ngrams,
        "zipf_fit": q_zipf_fit,
        "dsl_runtime_filter": q_dsl_runtime_filter,
        "dsl_script_score": q_dsl_script_score,
        "ingest_pipeline": q_ingest_pipeline,
        "ltr_rerank": q_ltr_rerank,
        "extract_links": q_extract_links,
        "curated_docs": q_curated_docs,
        "event_window_agg": q_event_window_agg,
        "date_histogram": q_date_histogram,
        # training-sequence assembly + phrase mining + diversification
        "chunk_docs": q_chunk_docs,
        "pack_spans": q_pack_spans,
        "pack_manifest": q_pack_manifest,
        "pack_text": q_pack_text,
        "collocations": q_collocations,
        "mmr_rerank": q_mmr_rerank,
        "mix_corpus": q_mix_corpus,
        "dsir_weights": q_dsir_weights,
        "dsir_selected": q_dsir_selected,
        "classifier_weights": q_classifier_weights,
        "classifier_scores": q_classifier_scores,
        "rank_feature_search": q_rank_feature,
        "simple_qs": q_simple_query_string,
        "missing_agg": q_missing_agg,
        "percentile_ranks": q_percentile_ranks,
        "adjacency_matrix": q_adjacency_matrix,
        "snippet_fragments": q_snippet_fragments,
        "url_pattern_keep": q_url_pattern_keep,
        "multi_match_cross": q_multi_match_cross,
        "json_props_agg": q_json_props_agg,
        "terms_agg_sized": q_terms_agg_sized,
        "span_first_search": q_span_first_search,
        "function_score_random": q_function_score_random,
        "dsl_mlt": q_dsl_mlt,
        "dsl_range_query": q_dsl_range_query,
        "dsl_bool_structured_filtered": q_dsl_bool_structured_filtered,
        "token_budget": q_token_budget,
        "span_dedup_stats": q_span_dedup_stats,
        "span_dedup_rewrite": q_span_dedup_rewrite,
        "composite_page": q_composite_page,
        "terms_metrics": q_terms_metrics,
        "extended_stats": q_extended_stats,
        "filters_agg": q_filters_agg,
        "dsl_dis_max": q_dsl_dis_max,
        "dsl_boosting": q_dsl_boosting,
        "dsl_constant_score": q_dsl_constant_score,
        "url_normalize": q_url_normalize,
        "url_dedup": q_url_dedup,
        "domain_stats": q_domain_stats,
        "cap_per_domain": q_cap_per_domain,
        "dsl_match_all": q_dsl_match_all,
        "dsl_ids": q_dsl_ids,
        "bpe_merges": q_bpe_merges,
        "bpe_encoded": q_bpe_encoded,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOKS = sql_tokens_duckdb("text")

_TF_CTE = f"""
toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
)
"""


def _analyzed_cte() -> tuple[str, str]:
    """(analyzed-token list fragment, analyzed tf CTE) replaying the
    analysis chain (Lucene classic stopwords + Harman S-stem,
    functions/analyzer.py) in DuckDB."""
    from hadoop_search_engine_spark.functions.analyzer import (
        ENGLISH_STOPWORDS,
        sql_analyze_duckdb,
    )

    atoks = sql_analyze_duckdb(_TOKS, ENGLISH_STOPWORDS, "s")
    cte = f"""
toks AS (
  SELECT doc_id, unnest({atoks}) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
)
"""
    return atoks, cte


def _dd_count_in(list_expr: str, words: list[str]) -> str:
    preds = " OR ".join(f"t = '{w}'" for w in words)
    return f"len(list_filter({list_expr}, t -> {preds}))"


def _fingerprint_sql() -> str:
    """DuckDB mirror of operators.text_analysis.fingerprint: fold
    acc*31 + murmur3(token) mod 2^56-5, left to right, empty/null -> 0."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb

    mm = sql_murmur3_u32_duckdb("_w")
    mod = (1 << 56) - 5
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               coalesce(list_reduce(
                   list_prepend(0::bigint, list_transform(toks, _w -> {mm})),
                   (_acc, _h) -> (_acc * 31 + _h) % {mod}), 0)::bigint
               AS fingerprint
        FROM t
    """


def _dd_minhash_pairs_subquery(src: str, threshold: float,
                               n_hashes: int = 64, bands: int = 16,
                               shingle_n: int = 3) -> str:
    """Parenthesized DuckDB subquery producing the near-dup pairs
    (a, b, est_jaccard) of relation ``src(doc_id, toks)`` — the replay
    of operators.dedup.minhash_lsh_pairs: murmur3 word-shingle hashes
    (functions.hashes emitter), the 64 affine permutations with their
    uint64 wraparound done in hugeint, banded candidate generation as
    list-slice equality (band-hash equality in Spark ⟺ band content
    equality, xxhash collisions aside), and the matching-component
    Jaccard estimate as the verdict."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb
    from hadoop_search_engine_spark.operators.dedup import _MERSENNE, _affine_params

    a_vec, b_vec = _affine_params(n_hashes)
    r = n_hashes // bands
    mm_win = sql_murmur3_u32_duckdb(
        f"array_to_string(toks[_i : _i + {shingle_n - 1}], ' ')"
    )
    mm_all = sql_murmur3_u32_duckdb("array_to_string(toks, ' ')")
    sig_terms = ", ".join(
        f"coalesce(list_min(list_transform(sh, _h -> "
        f"(((_h::hugeint * {int(a_vec[k])} + {int(b_vec[k])}) % {1 << 64}) "
        f"% {_MERSENNE})::bigint)), 0)"
        for k in range(n_hashes)
    )
    band_match = (
        f"len(list_filter(range(0, {bands}), _b -> "
        f"x.sig[_b*{r}+1 : _b*{r}+{r}] = y.sig[_b*{r}+1 : _b*{r}+{r}])) > 0"
    )
    est = (
        f"len(list_filter(range(1, {n_hashes + 1}), "
        f"_i -> x.sig[_i] = y.sig[_i])) / {float(n_hashes)}"
    )
    return f"""(
        WITH shl AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= {shingle_n} THEN
                        list_transform(range(1, len(toks) - {shingle_n - 2}),
                                       _i -> {mm_win})
                      WHEN len(toks) > 0 THEN [{mm_all}]
                      ELSE []::bigint[] END AS sh
          FROM {src}
        ),
        sigs AS (SELECT doc_id, [{sig_terms}] AS sig FROM shl)
        SELECT x.doc_id AS a, y.doc_id AS b,
               round({est}, 6) AS est_jaccard
        FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
        WHERE {band_match} AND {est} >= {threshold}
    )"""


def _dd_minhash_sql(toks_expr: str, threshold: float = 0.3) -> str:
    return f"""
        WITH t AS (SELECT doc_id, {toks_expr} AS toks FROM documents)
        SELECT * FROM {_dd_minhash_pairs_subquery("t", threshold)} pairs
    """


def _dd_simhash_cte(toks_expr: str) -> str:
    """DuckDB CTE tail computing per-doc 64-bit simhash signatures —
    the exact murmur3-based majority-vote packing of
    operators.dedup.simhash_signatures (low word = murmur3(token),
    high word = salt-chained murmur3; bit 63 folds back to the signed
    long range)."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb
    from hadoop_search_engine_spark.operators.dedup import SIMHASH_HI_SALT

    lo = sql_murmur3_u32_duckdb("_w")
    hi = sql_murmur3_u32_duckdb(f"'{SIMHASH_HI_SALT}'", seed=lo)
    bit_terms = []
    for k in range(64):
        src, s = ("los", k) if k < 32 else ("his", k - 32)
        cnt = (
            f"coalesce(list_sum(list_transform({src}, "
            f"_h -> (_h // {1 << s}) % 2)), 0)"
        )
        bit_terms.append(
            f"(CASE WHEN 2 * {cnt} >= n THEN {1 << k}::hugeint "
            f"ELSE 0::hugeint END)"
        )
    total = "\n          + ".join(bit_terms)
    return f"""
        simtok AS (SELECT doc_id, {toks_expr} AS toks FROM documents),
        simh AS (
          SELECT doc_id,
                 list_transform(toks, _w -> {lo}) AS los,
                 list_transform(toks, _w -> {hi}) AS his,
                 len(toks) AS n
          FROM simtok
        ),
        simraw AS (
          SELECT doc_id,
                 CASE WHEN n > 0 THEN {total} ELSE 0::hugeint END AS raw
          FROM simh
        ),
        simsig AS (
          SELECT doc_id,
                 (CASE WHEN raw >= {1 << 63}::hugeint
                       THEN raw - {1 << 64}::hugeint
                       ELSE raw END)::bigint AS simhash
          FROM simraw
        )
    """


def _dd_lsh_bucket(vec_expr: str, n_planes: int = 6, dim: int = 64) -> str:
    """DuckDB expression computing the SAME sign-pattern LSH bucket as
    operators.similarity (the hyperplanes are deterministic from
    (dim, n_planes), so they inline as float literals)."""
    from hadoop_search_engine_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    bits = []
    for i, row in enumerate(planes):
        lit = "[" + ", ".join(repr(float(w)) for w in row) + "]::double[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_expr}::double[], {lit}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(bits) + ")"


def _dd_ivf_sql(n_centroids: int, n_iters: int, n_probe: int, k: int) -> str:
    """DuckDB replay of the WHOLE IVF pipeline — ivf_train's Lloyd
    iterations unrolled as chained CTEs, then the n_probe nearest-
    centroid scan (operators/similarity.py ivf_train/ivf_topk).

    Exactness rests on three trainer properties (see ivf_train's
    docstring): murmur3 seeding (replayed via functions.hashes),
    6-decimal centroid quantization each iteration (kills cross-engine
    float summation-order drift), and scale-invariant assignment
    (argmax of raw dot products, ties to the lowest cluster index)."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb

    mm = sql_murmur3_u32_duckdb("(vec_id::varchar)")

    def assign(name: str, cent: str) -> str:
        return f"""
        {name} AS (
          SELECT vec_id, v, cluster FROM (
            SELECT h.vec_id, h.v, c.cluster,
                   row_number() OVER (
                     PARTITION BY h.vec_id
                     ORDER BY list_dot_product(h.v, c.cv) DESC, c.cluster
                   ) AS rn
            FROM hashed h CROSS JOIN {cent} c
          ) WHERE rn = 1
        )"""

    ctes = [
        f"""hashed AS (
          SELECT vec_id, embedding::double[] AS v, {mm} AS h
          FROM embeddings
        )""",
        f"""seeds AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, v
          FROM (SELECT * FROM hashed ORDER BY h, vec_id LIMIT {n_centroids})
        )""",
        """cent0 AS (
          SELECT cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
          FROM seeds
        )""",
        """centv0 AS (
          SELECT cluster, list(val ORDER BY dim) AS cv FROM cent0 GROUP BY cluster
        )""",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(assign(f"assign{i}", f"centv{i - 1}"))
        ctes.append(f"""mean{i} AS (
          SELECT cluster, dim, round(avg(val), 6) AS mval
          FROM (SELECT cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
                FROM assign{i})
          GROUP BY cluster, dim
        )""")
        ctes.append(f"""cent{i} AS (
          SELECT c.cluster, c.dim, coalesce(m.mval, c.val) AS val
          FROM cent{i - 1} c LEFT JOIN mean{i} m USING (cluster, dim)
        )""")
        ctes.append(f"""centv{i} AS (
          SELECT cluster, list(val ORDER BY dim) AS cv FROM cent{i} GROUP BY cluster
        )""")
    ctes.append("q AS (SELECT embedding::double[] AS qv FROM embeddings WHERE vec_id = 0)")
    ctes.append(f"""probe AS (
          SELECT cluster FROM (
            SELECT c.cluster,
                   row_number() OVER (
                     ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cluster
                   ) AS rn
            FROM centv{n_iters} c, q
          ) WHERE rn <= {n_probe}
        )""")
    ctes.append(assign("final_assign", f"centv{n_iters}"))
    return f"""
        WITH {", ".join(ctes)}
        SELECT a.vec_id,
               round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
        FROM final_assign a, q
        WHERE a.cluster IN (SELECT cluster FROM probe)
        ORDER BY cosine DESC, a.vec_id ASC LIMIT {k}
    """


def _dd_pq_sql(m: int, nbits: int, n_iters: int, k: int, dim: int) -> str:
    """DuckDB replay of the WHOLE PQ pipeline (similarity.py pq_train /
    pq_encode / pq_topk): per-subspace Lloyd iterations in relational
    form — centroids live as (sub, code, dim, val) rows with GLOBAL
    dim indexes, so one CTE chain covers all m subspaces — then the
    final encode and the ADC dot-product top-k. Exactness rests on
    the trainer's 6-dp quantization of assignment scores and centroid
    means (see pq_train's docstring)."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb

    mm = sql_murmur3_u32_duckdb("(vec_id::varchar)")
    codes = 1 << nbits
    dsub = dim // m
    ctes = [
        f"""hashed AS (
          SELECT vec_id, embedding::double[] AS v, {mm} AS h
          FROM embeddings
        )""",
        f"""seeds AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS code, v
          FROM (SELECT * FROM hashed ORDER BY h, vec_id LIMIT {codes})
        )""",
        f"""x AS (
          SELECT vec_id, (dim // {dsub})::int AS sub, dim, val
          FROM (SELECT vec_id, unnest(range(len(v))) AS dim,
                       unnest(v) AS val FROM hashed)
        )""",
        f"""cent0 AS (
          SELECT (dim // {dsub})::int AS sub, code, dim, val
          FROM (SELECT code, unnest(range(len(v))) AS dim,
                       unnest(v) AS val FROM seeds)
        )""",
    ]

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, sub, code FROM (
            SELECT s.vec_id, s.sub, s.code,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.sub
                     ORDER BY s.s DESC, s.code ASC
                   ) AS rn
            FROM (
              SELECT x.vec_id, c.sub, c.code,
                     round(2 * sum(x.val * c.val)
                           - sum(c.val * c.val), 6) AS s
              FROM x JOIN {cent} c ON x.sub = c.sub AND x.dim = c.dim
              GROUP BY x.vec_id, c.sub, c.code
            ) s
          ) WHERE rn = 1
        )"""

    for i in range(1, n_iters + 1):
        ctes.append(assign(f"assign{i}", f"cent{i - 1}"))
        ctes.append(f"""mean{i} AS (
          SELECT a.sub, a.code, x.dim, round(avg(x.val), 6) AS mval
          FROM assign{i} a
          JOIN x ON x.vec_id = a.vec_id AND x.sub = a.sub
          GROUP BY a.sub, a.code, x.dim
        )""")
        ctes.append(f"""cent{i} AS (
          SELECT c.sub, c.code, c.dim, coalesce(m.mval, c.val) AS val
          FROM cent{i - 1} c
          LEFT JOIN mean{i} m
            ON m.sub = c.sub AND m.code = c.code AND m.dim = c.dim
        )""")
    ctes.append(assign("enc", f"cent{n_iters}"))
    ctes.append(f"""q AS (
          SELECT (dim // {dsub})::int AS sub, dim, val
          FROM (SELECT unnest(range(len(v))) AS dim, unnest(v) AS val
                FROM hashed WHERE vec_id = 0)
        )""")
    return f"""
        WITH {", ".join(ctes)}
        SELECT vec_id, round(sum(q.val * c.val), 6) AS score
        FROM enc e
        JOIN cent{n_iters} c ON c.sub = e.sub AND c.code = e.code
        JOIN q ON q.sub = c.sub AND q.dim = c.dim
        GROUP BY vec_id
        ORDER BY score DESC, vec_id ASC LIMIT {k}
    """


def _dd_ivfpq_sql(
    n_centroids: int,
    ivf_iters: int,
    m: int,
    nbits: int,
    pq_iters: int,
    n_probe: int,
    k: int,
    dim: int,
) -> str:
    """DuckDB replay of the WHOLE IVF-PQ pipeline
    (similarity.py ivfpq_train / ivfpq_encode / ivfpq_topk): the IVF
    Lloyd chain (as in _dd_ivf_sql), residual rows against the final
    coarse centroids, the per-subspace PQ chain over the residuals
    (as in _dd_pq_sql), then the probe prune and the
    base-plus-ADC score."""
    from hadoop_search_engine_spark.functions.hashes import sql_murmur3_u32_duckdb

    mm = sql_murmur3_u32_duckdb("(vec_id::varchar)")
    codes = 1 << nbits
    dsub = dim // m

    def ivf_assign(name: str, cent: str) -> str:
        # round(·,6) matches similarity._assign_raw_q — IVF-PQ needs
        # bit-reproducible assignment (see that docstring)
        return f"""{name} AS (
          SELECT vec_id, v, cluster FROM (
            SELECT h.vec_id, h.v, c.cluster,
                   row_number() OVER (
                     PARTITION BY h.vec_id
                     ORDER BY round(list_dot_product(h.v, c.cv), 6) DESC,
                              c.cluster
                   ) AS rn
            FROM hashed h CROSS JOIN {cent} c
          ) WHERE rn = 1
        )"""

    def pq_assign(name: str, cent: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, sub, code FROM (
            SELECT s.vec_id, s.sub, s.code,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.sub
                     ORDER BY s.s DESC, s.code ASC
                   ) AS rn
            FROM (
              SELECT rx.vec_id, c.sub, c.code,
                     round(2 * sum(rx.val * c.val)
                           - sum(c.val * c.val), 6) AS s
              FROM rx JOIN {cent} c ON rx.sub = c.sub AND rx.dim = c.dim
              GROUP BY rx.vec_id, c.sub, c.code
            ) s
          ) WHERE rn = 1
        )"""

    ctes = [
        f"""hashed AS (
          SELECT vec_id, embedding::double[] AS v, {mm} AS h
          FROM embeddings
        )""",
        f"""seeds AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, v
          FROM (SELECT * FROM hashed ORDER BY h, vec_id LIMIT {n_centroids})
        )""",
        """cent0 AS (
          SELECT cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
          FROM seeds
        )""",
        """centv0 AS (
          SELECT cluster, list(val ORDER BY dim) AS cv FROM cent0 GROUP BY cluster
        )""",
    ]
    for i in range(1, ivf_iters + 1):
        ctes.append(ivf_assign(f"assign{i}", f"centv{i - 1}"))
        ctes.append(f"""mean{i} AS (
          SELECT cluster, dim, round(avg(val), 6) AS mval
          FROM (SELECT cluster, unnest(range(len(v))) AS dim, unnest(v) AS val
                FROM assign{i})
          GROUP BY cluster, dim
        )""")
        ctes.append(f"""cent{i} AS (
          SELECT c.cluster, c.dim, coalesce(m.mval, c.val) AS val
          FROM cent{i - 1} c LEFT JOIN mean{i} m USING (cluster, dim)
        )""")
        ctes.append(f"""centv{i} AS (
          SELECT cluster, list(val ORDER BY dim) AS cv FROM cent{i} GROUP BY cluster
        )""")
    ctes.append(ivf_assign("final_assign", f"centv{ivf_iters}"))
    ctes.append(f"""rx AS (
          SELECT e.vec_id, e.cluster, (e.dim // {dsub})::int AS sub,
                 e.dim, e.val - c.val AS val
          FROM (SELECT vec_id, cluster, unnest(range(len(v))) AS dim,
                       unnest(v) AS val FROM final_assign) e
          JOIN cent{ivf_iters} c ON c.cluster = e.cluster AND c.dim = e.dim
        )""")
    ctes.append(f"""pseeds AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS code, vec_id
          FROM (SELECT vec_id, h FROM hashed ORDER BY h, vec_id LIMIT {codes})
        )""")
    ctes.append("""pcent0 AS (
          SELECT rx.sub, s.code, rx.dim, rx.val AS val
          FROM rx JOIN pseeds s USING (vec_id)
        )""")
    for i in range(1, pq_iters + 1):
        ctes.append(pq_assign(f"passign{i}", f"pcent{i - 1}"))
        ctes.append(f"""pmean{i} AS (
          SELECT a.sub, a.code, rx.dim, round(avg(rx.val), 6) AS mval
          FROM passign{i} a
          JOIN rx ON rx.vec_id = a.vec_id AND rx.sub = a.sub
          GROUP BY a.sub, a.code, rx.dim
        )""")
        ctes.append(f"""pcent{i} AS (
          SELECT c.sub, c.code, c.dim, coalesce(m.mval, c.val) AS val
          FROM pcent{i - 1} c
          LEFT JOIN pmean{i} m
            ON m.sub = c.sub AND m.code = c.code AND m.dim = c.dim
        )""")
    ctes.append(pq_assign("penc", f"pcent{pq_iters}"))
    ctes.append("qv AS (SELECT v AS qv FROM hashed WHERE vec_id = 0)")
    ctes.append(f"""q AS (
          SELECT (dim // {dsub})::int AS sub, dim, val
          FROM (SELECT unnest(range(len(qv))) AS dim, unnest(qv) AS val
                FROM qv)
        )""")
    ctes.append(f"""probe AS (
          SELECT cluster FROM (
            SELECT c.cluster,
                   row_number() OVER (
                     ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cluster
                   ) AS rn
            FROM centv{ivf_iters} c, qv q
          ) WHERE rn <= {n_probe}
        )""")
    ctes.append(f"""qbase AS (
          SELECT cluster, list_dot_product(cv, q.qv) AS b
          FROM centv{ivf_iters}, qv q
        )""")
    return f"""
        WITH {", ".join(ctes)}
        SELECT a.vec_id, round(b.b + adc.s, 6) AS score
        FROM final_assign a
        JOIN (
          SELECT e.vec_id, sum(q.val * c.val) AS s
          FROM penc e
          JOIN pcent{pq_iters} c ON c.sub = e.sub AND c.code = e.code
          JOIN q ON q.sub = c.sub AND q.dim = c.dim
          GROUP BY e.vec_id
        ) adc ON adc.vec_id = a.vec_id
        JOIN qbase b ON b.cluster = a.cluster
        WHERE a.cluster IN (SELECT cluster FROM probe)
        ORDER BY score DESC, a.vec_id ASC LIMIT {k}
    """


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for every queries() entry — definitions live in
    the oracle_sql/ package (split for navigability; each part module
    docstring lists its board entries). The parts close over this
    module's globals exactly as the former inline body did."""
    from oracle_sql import build

    return build(globals())
