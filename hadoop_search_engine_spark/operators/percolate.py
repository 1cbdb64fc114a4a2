"""Percolation: reverse search — match documents against registered queries.

The forward engine answers "which docs match this query"; percolation
answers "which REGISTERED QUERIES match this doc" (Elasticsearch's
percolator): the primitive behind alerting, saved searches, and
routing rules in a streaming webtext pipeline. The reference engine
has no analog — its serving map only runs forward lookups
(server/src/services/search.service.js:12-16).

Design (Spark-first, no index needed): the registered query set is
vocabulary-tiny, so it compiles driver-side into a literal
``(query_id, term)`` table plus a per-query match requirement
(``or`` = 1, ``and`` = all terms, or an explicit ``min_match``).
Incoming docs are tokenized ONCE (``array_distinct`` before explode —
presence, not tf), the term table joins in as a BROADCAST hash join,
and a partial-aggregated count of distinct matched terms per
``(doc_id, query_id)`` gates against the requirement.

100 TB shape: one corpus-scan tokenize pass, a map-side broadcast
join (the query table is KBs), and a groupBy whose key space is
bounded by actual (doc, query) term matches — no shuffle of the
corpus beyond the matched pairs, nothing scales with |queries| ×
|docs|. The same transformation applied per micro-batch
(``foreachBatch``) percolates a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens_col
from .query_exec import parse_query


def compile_queries(
    queries: list[dict],
    synonyms: dict[str, str] | None = None,
) -> list[tuple[str, str, int]]:
    """Registered queries -> flat ``(query_id, term, n_required)``
    rows. Each query is ``{"query_id": ..., "query_text": ...}`` with
    optional ``mode`` ("or" default, "and") and ``min_match`` (an
    explicit at-least-m count, overriding mode). Query text goes
    through the standard tokenize -> synonym -> dedup pipeline. A
    query with no tokens, an unknown mode, or an unreachable
    ``min_match`` (> its term count) is rejected loudly — a silently
    never-matching alert is the worst failure mode a percolator can
    have."""
    out: list[tuple[str, str, int]] = []
    seen: set[str] = set()
    for q in queries:
        qid = str(q["query_id"])
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid!r}")
        seen.add(qid)
        mode = q.get("mode", "or")
        if mode not in ("or", "and"):
            raise ValueError(f"query {qid!r}: mode must be or|and, got {mode!r}")
        terms = parse_query(q["query_text"], synonyms)
        if not terms:
            raise ValueError(f"query {qid!r} has no tokens")
        mm = q.get("min_match")
        if mm is None:
            n_required = len(terms) if mode == "and" else 1
        else:
            n_required = int(mm)
            if not (1 <= n_required <= len(terms)):
                raise ValueError(
                    f"query {qid!r}: min_match {n_required} outside "
                    f"[1, {len(terms)}] — it could never match"
                )
        out.extend((qid, t, n_required) for t in terms)
    return out


def percolate(
    docs: DataFrame,
    queries: list[dict] | DataFrame,
    synonyms: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Which registered queries match each document. Returns
    ``(doc_id, query_id, n_matched)`` — one row per satisfied (doc,
    query) pair, ``n_matched`` = distinct query terms present in the
    doc. See the module docstring for the plan; works identically on
    a static frame or inside ``foreachBatch`` on a stream.

    ``queries`` is normally the registered list (compiled driver-side
    and BROADCAST — right up to tens of thousands of queries). For a
    query REGISTRY past driver size — millions of saved searches — pass
    a DataFrame with columns ``(query_id, term, n_required)`` instead
    (e.g. a parquet table maintained by :func:`compile_queries` batches):
    the join then falls back to Spark's planner, which shuffles both
    sides on the term key (AQE still broadcasts if the registry turns
    out small). Same semantics either way.
    """
    spark = docs.sparkSession
    if isinstance(queries, DataFrame):
        qdf = queries.select("query_id", "term", "n_required")
        joined_q = qdf  # planner decides: broadcast if small, else shuffle
    else:
        rows = compile_queries(queries, synonyms)
        qdf = spark.createDataFrame(
            rows, "query_id string, term string, n_required int"
        )
        joined_q = F.broadcast(qdf)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    return (
        toks.join(joined_q, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.countDistinct("term").alias("n_matched"),
            F.first("n_required").alias("n_required"),
        )
        .where(F.col("n_matched") >= F.col("n_required"))
        .select("doc_id", "query_id", "n_matched")
    )
