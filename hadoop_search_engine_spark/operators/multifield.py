"""Multi-field indexes + ES ``multi_match`` over them.

The reference engine indexes ONE text blob per document (README.md's
4-line Scala job has a single (file, words) input; the serving map is
term -> docs, server/src/services/search.service.js:12-16). Real web
search is multi-field — title vs body vs anchor text, each with its
own statistics and boost. This module composes that capability from
the existing single-field machinery with NO new scorer code:

  * ``build_multifield_index`` builds one complete sub-index per field
    (same block/posting format, its own df/dl/avgdl — field-accurate
    statistics, exactly Lucene's per-field inverted index) under
    ``out_dir/fields/<name>/``, sharing the corpus doc_id space.
  * ``multi_match`` scores the query against every requested field via
    :func:`~.query_exec.scored_docs` (the FULL scored match set per
    field, cost ∝ query df — a doc outside one field's top-k can lead
    the combined ranking, so per-field top-k merges would be
    inexact), then combines per doc:
      - ``most_fields``: sum of field scores (boost-weighted) —
        ES multi_match most_fields semantics;
      - ``best_fields``: max field score + ``tie_breaker`` * (sum of
        the others) — ES best_fields with tie_breaker (0 = pure max,
        1 ≡ most_fields).
    ``mode="and"`` is per-field conjunctive: a doc qualifies if at
    least one field contains EVERY query term, and each qualifying
    field contributes (ES best_fields + operator=and semantics).

At scale the combine is one shuffle of the matched doc set (never the
corpus): union per-field (doc_id, score), hash-aggregate by doc_id,
TakeOrderedAndProject for the final k. Driver serving combines the
per-field pair lists in NumPy with no Spark job at all. Per-query
``similarity`` (operators/ranking.py) composes — each field scores
under the chosen model with its own field statistics.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import build_index
from .query_exec import Index, scored_docs, scored_docs_pairs

_MANIFEST = "fields.json"


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    fields: dict[str, object],
    concurrency: int = 1,
    **build_kw,
) -> "MultiFieldIndex":
    """Build one sub-index per field. ``fields`` maps field name ->
    column (name or Column expression) on ``docs``; every sub-index is
    a full, independently-servable Index (phrase/fuzzy/facets all work
    per field). Docs where a field is empty simply don't appear in
    that field's sub-index — its n_docs/avgdl are field-accurate.

    ``concurrency``: field builds to run as CONCURRENT Spark jobs
    (driver threads; build_index mutates no session state). Default 1
    — at full scale each build saturates the cluster, so sequential is
    right; at small scale >1 amortizes per-build fixed costs (job
    scheduling, JIT) across fields. The index bytes are identical
    either way (each build is its own deterministic job tree)."""
    if not fields:
        raise ValueError("fields must name at least one field")
    for name in fields:
        if not name or "/" in name:
            raise ValueError(f"bad field name {name!r}")

    def _one(item):
        name, col = item
        col = F.col(col) if isinstance(col, str) else col
        build_index(
            spark,
            docs.select("doc_id", col.alias("text")),
            os.path.join(out_dir, "fields", name),
            **build_kw,
        )

    items = sorted(fields.items())
    if concurrency > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            list(ex.map(_one, items))
    else:
        for it in items:
            _one(it)
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"fields": sorted(fields)}, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return MultiFieldIndex.load(spark, out_dir)


@dataclass
class MultiFieldIndex:
    spark: SparkSession
    out_dir: str
    fields: dict[str, Index]

    @classmethod
    def load(cls, spark: SparkSession, out_dir: str) -> "MultiFieldIndex":
        with open(os.path.join(out_dir, _MANIFEST)) as f:
            names = json.load(f)["fields"]
        return cls(
            spark=spark,
            out_dir=out_dir,
            fields={
                n: Index.load(spark, os.path.join(out_dir, "fields", n))
                for n in names
            },
        )


def _resolve_boosts(
    mf: MultiFieldIndex, boosts: dict[str, float] | None
) -> dict[str, float]:
    boosts = dict(boosts) if boosts else {n: 1.0 for n in mf.fields}
    unknown = set(boosts) - set(mf.fields)
    if unknown:
        raise ValueError(
            f"unknown fields {sorted(unknown)}; index has {sorted(mf.fields)}"
        )
    return boosts


def _check_combine(combine: str, tie_breaker: float) -> None:
    if combine not in ("most_fields", "best_fields", "cross_fields"):
        raise ValueError(
            "combine must be most_fields|best_fields|cross_fields, "
            f"got {combine!r}"
        )
    if not (0.0 <= tie_breaker <= 1.0):
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")


def combine_scored_parts(
    parts: list[DataFrame],
    combine: str,
    tie_breaker: float,
    k: int,
) -> DataFrame:
    """The shared distributed combine: union the per-field scored
    match sets, ONE hash-aggregate keyed by doc_id (matched-set-sized,
    never the corpus), top-k. Also the engine under the list-based
    :func:`~.query_exec.search_topk_fields`."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    if combine == "most_fields":
        score = F.sum("score")
    else:
        score = F.max("score") + tie_breaker * (F.sum("score") - F.max("score"))
    return (
        u.groupBy("doc_id")
        .agg(score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def multi_match(
    mf: MultiFieldIndex,
    query_text: str,
    k: int = 10,
    boosts: dict[str, float] | None = None,
    combine: str = "most_fields",
    tie_breaker: float = 0.0,
    mode: str = "or",
    synonyms: dict[str, str] | None = None,
    similarity=None,
) -> DataFrame:
    """Top-k (doc_id, score) across fields — distributed combine of
    the per-field scored match sets (see module docstring)."""
    _check_combine(combine, tie_breaker)
    boosts = _resolve_boosts(mf, boosts)
    if combine == "cross_fields":
        if similarity is not None:
            raise ValueError(
                "cross_fields composes with BM25 only (per-term "
                "max-contribution semantics)"
            )
        return cross_fields_topk(
            [(mf.fields[n], w) for n, w in sorted(boosts.items())],
            query_text, k=k, mode=mode, synonyms=synonyms,
        )
    parts = [
        scored_docs(mf.fields[name], query_text, synonyms=synonyms,
                    mode=mode, similarity=similarity, boost=w)
        for name, w in sorted(boosts.items())
    ]
    return combine_scored_parts(parts, combine, tie_breaker, k)


def multi_match_rows(
    mf: MultiFieldIndex,
    query_text: str,
    k: int = 10,
    boosts: dict[str, float] | None = None,
    combine: str = "most_fields",
    tie_breaker: float = 0.0,
    mode: str = "or",
    synonyms: dict[str, str] | None = None,
    similarity=None,
) -> list[tuple[int, float]]:
    """Driver-served :func:`multi_match` — per-field scored match sets
    via the pyarrow read path, combined in plain Python dicts, no
    Spark job. Same constraints as ``search_topk_rows``."""
    _check_combine(combine, tie_breaker)
    boosts = _resolve_boosts(mf, boosts)
    sums: dict[int, float] = {}
    maxes: dict[int, float] = {}
    for name, w in sorted(boosts.items()):
        for d, s in scored_docs_pairs(
            mf.fields[name], query_text, synonyms=synonyms, mode=mode,
            similarity=similarity, boost=w,
        ):
            sums[d] = sums.get(d, 0.0) + s
            if s > maxes.get(d, float("-inf")):
                maxes[d] = s
    if combine == "most_fields":
        scored = sums
    else:
        scored = {
            d: maxes[d] + tie_breaker * (sums[d] - maxes[d]) for d in sums
        }
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(int(d), float(s)) for d, s in top]


def cross_fields_topk(
    fields: list[tuple],
    query_text: str,
    k: int = 10,
    mode: str = "or",
    synonyms: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``multi_match type=cross_fields`` (term-centric): treat the
    fields as one logical field — each query TERM scores as its best
    per-field contribution, ``score(doc) = Σ_t max_f(w_f ·
    BM25_f(t))`` — the person-name-across-first/last-name-fields
    query shape that most_fields/best_fields (field-centric) get
    wrong. ``mode="and"`` is ES ``operator=and``: every in-vocabulary
    term must match in AT LEAST ONE field (per-term, not per-field —
    the defining cross_fields difference).

    Determinism contract: per-(doc, term) maxes round to 6 dp and sum
    as DECIMAL (exact, order-independent — a float sum over 3+ terms
    would expose partition order in the last ulp), so the DuckDB
    oracle replays bit-identically. Scale shape: one scored match set
    per (field, term) — each field's postings decode once per term,
    the same total df cost as most_fields — then ONE hash aggregate
    keyed by (doc, term) and one by doc; no cartesian, top-k at the
    end. ``fields``: list of (Index, weight), as search_topk_fields.
    """
    from ..functions.tokenizer import tokenize
    from .query_exec import scored_docs

    if mode not in ("or", "and"):
        raise ValueError(f"mode must be or|and, got {mode!r}")
    if not fields:
        raise ValueError("fields must name at least one (Index, weight)")
    syn = synonyms or {}
    toks = sorted({syn.get(t, t) for t in tokenize(query_text)})
    if not toks:
        first = fields[0][0]
        from .query_exec import TOPK_SCHEMA, _empty_df

        return _empty_df(first.spark, TOPK_SCHEMA)
    parts = []
    for tok in toks:
        for ix, w in fields:
            parts.append(
                scored_docs(ix, tok, boost=float(w)).withColumn(
                    "_t", F.lit(tok)
                )
            )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    per_term = u.groupBy("doc_id", "_t").agg(
        F.round(F.max("score"), 6).alias("_s")
    )
    agg = per_term.groupBy("doc_id").agg(
        F.sum(F.col("_s").cast("decimal(28,10)")).alias("_sum"),
        F.countDistinct("_t").alias("_nt"),
    )
    if mode == "and":
        req = per_term.select(
            F.countDistinct("_t").alias("_req")
        )
        agg = agg.crossJoin(F.broadcast(req)).where(
            F.col("_nt") == F.col("_req")
        )
    return (
        agg.select(
            "doc_id",
            F.round(F.col("_sum").cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )


def combined_fields_topk(
    docs: DataFrame,
    query_text: str,
    fields: dict[str, object],
    boosts: dict[str, float] | None = None,
    k: int = 10,
    k1: float | None = None,
    b: float | None = None,
    synonyms: dict[str, str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``combined_fields`` query — term-centric BM25F: the listed
    fields are scored AS ONE combined field with per-field weights
    folded into the TERM FREQUENCIES, not the scores:

        tf_c(t, d)  = Σ_f  w_f · tf_f(t, d)
        dl_c(d)     = Σ_f  w_f · len_f(d)
        df(t)       = |{d : t in ANY listed field of d}|
        score(d)    = Σ_t idf(df) · BM25(tf_c, dl_c, avgdl_c)

    This is what distinguishes it from ``multi_match``: a term
    spread thinly across fields accumulates ONE saturating tf instead
    of several independently-saturating per-field scores — the
    principled fix for repeated-anchor/title boosting (Robertson's
    BM25F argument). ES restricts the per-field boost to >= 1 and so
    does this.

    Exhaustive DataFrame path (one weighted-token explode, two
    partial-aggregated groupBys, a broadcast 1-row stats join, top-k)
    — the indexed analog would store per-field tf in the postings;
    the per-field sub-indexes (:func:`build_multifield_index`) keep
    per-field SCORES exact instead, so this path is the combined_
    fields oracle-able reference. N/avgdl are over docs with >= 1
    token in >= 1 listed field (the engine's stats convention)."""
    from hadoop_search_engine_spark import BM25_B, BM25_K1
    from hadoop_search_engine_spark.functions.bm25 import idf_col, score_col
    from hadoop_search_engine_spark.functions.tokenizer import tokens_col

    from .query_exec import TOPK_SCHEMA, _empty_df, parse_query

    boosts = boosts or {f_: 1.0 for f_ in fields}
    if set(boosts) - set(fields):
        raise ValueError(
            f"boosts name unknown fields {sorted(set(boosts) - set(fields))}"
        )
    if any(w < 1.0 for w in boosts.values()):
        raise ValueError("combined_fields boosts must be >= 1 (ES rule)")
    k1 = BM25_K1 if k1 is None else float(k1)
    b = BM25_B if b is None else float(b)
    terms = sorted(set(parse_query(query_text, synonyms)))
    if not terms:
        return _empty_df(docs.sparkSession, TOPK_SCHEMA)

    parts = []
    for name, expr in fields.items():
        col = F.col(expr) if isinstance(expr, str) else expr
        w = float(boosts.get(name, 1.0))
        parts.append(
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.explode(tokens_col(col)).alias("term"),
                F.lit(w).alias("w"),
            )
        )
    long = parts[0]
    for p in parts[1:]:
        long = long.unionByName(p)

    dl = long.groupBy("doc_id").agg(F.sum("w").alias("dlc"))
    c = dl.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("dlc").alias("avgdlc"),
    )
    ql = long.where(F.col("term").isin(terms))
    tfc = ql.groupBy("doc_id", "term").agg(F.sum("w").alias("tfc"))
    dfreq = (
        ql.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    scored = (
        tfc.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(c))
        .withColumn(
            "_s",
            score_col(F.col("tfc"), F.col("dlc"),
                      idf_col(F.col("n"), F.col("df")),
                      F.col("avgdlc"), k1=k1, b=b),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )
