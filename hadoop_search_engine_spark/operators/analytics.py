"""Search-result analytics: total-hit counting and significant terms.

The reference engine ships every matched doc id to the client, so
"how many documents matched" and "which terms characterize the
matches" are client-side loops over that list (the serving map walk in
server/src/services/search.service.js:12-16 returns the full set).
Here both are first-class distributed operators over the block index:

- :func:`count_matches` — the total-hits number a search UI shows next
  to page 1 (Lucene's TotalHitCountCollector / Elasticsearch
  ``track_total_hits``). Cost is proportional to the query terms'
  total df (a pruned postings decode + count), never a corpus scan.
- :func:`significant_terms` — Elasticsearch-style significant-terms
  aggregation: the terms that are unusually frequent in the result
  set relative to the whole corpus ("what is this result set about").
  The foreground doc set comes from the index's postings and the
  background statistics from the index's lexicon, so the ONLY corpus
  touch is a doc_id semi-join that re-reads just the matched docs.

100 TB shape: ``count_matches`` never moves more than the decoded
posting doc_ids for the query terms (distinct/groupBy on int64 keys);
``significant_terms`` shuffles (a) the matched doc_id set for the
semi-join against the corpus and (b) one vocab-sized term-count agg
over ONLY the matched docs, joined to the vocab-sized lexicon. Nothing
scales with corpus size except the pruned semi-join read itself, which
a doc_id-partitioned corpus layout turns into a pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens_col
from .query_exec import (
    Index,
    _empty_df,
    matched_docs,
    matched_docs_dataframe,
    parse_query,
)

SCORERS = ("jlh", "pmi")

_SIG_SCHEMA = "term string, fg_df bigint, bg_df bigint, score double"


def count_matches(
    index: Index,
    query_text: str,
    synonyms: dict[str, str] | None = None,
    mode: str = "or",
) -> DataFrame:
    """Total-hits count for a query: one row, one ``n_hits`` column.

    A count aggregation over :func:`matched_docs` — the bucket- and
    term_hash-pruned postings decode with tombstones masked — so the
    scan reads only the query terms' posting rows. The count itself is
    map-side partial; a single long crosses the final exchange.
    """
    return matched_docs(index, query_text, synonyms, mode).agg(
        F.count("*").alias("n_hits")
    )


def count_matches_dataframe(
    docs: DataFrame,
    query_text: str,
    synonyms: dict[str, str] | None = None,
    mode: str = "or",
) -> DataFrame:
    """Exhaustive corpus-scan baseline for :func:`count_matches` (the
    DuckDB-oracle-comparable form)."""
    return matched_docs_dataframe(docs, query_text, synonyms, mode).agg(
        F.count("*").alias("n_hits")
    )


def _sig_score(scorer: str, fg_pct, bg_pct):
    """Significance score column. ``jlh`` is Elasticsearch's default
    ((fg% - bg%) * fg% / bg% — rewards both absolute lift and ratio);
    ``pmi`` is pointwise mutual information ln(fg% / bg%). Both are
    written in strict left-to-right double arithmetic so a SQL replay
    of the same expression is bit-identical."""
    if scorer == "jlh":
        return (fg_pct - bg_pct) * fg_pct / bg_pct
    if scorer == "pmi":
        return F.log(fg_pct / bg_pct)
    raise ValueError(f"scorer must be one of {SCORERS}, got {scorer!r}")


def significant_terms(
    index: Index,
    documents: DataFrame,
    query_text: str,
    k: int = 20,
    *,
    min_fg_df: int = 2,
    scorer: str = "jlh",
    synonyms: dict[str, str] | None = None,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Terms that are unusually frequent in the query's result set
    relative to the whole corpus (Elasticsearch ``significant_terms``).

    Output: ``(term, fg_df, bg_df, score)`` — document frequency of
    the term inside the matched set (fg) and corpus-wide (bg, from the
    index's lexicon), ordered by rounded score desc then term asc,
    limited to ``k``. The query's own terms are excluded; terms seen
    in fewer than ``min_fg_df`` matched docs are dropped (they cannot
    be evidence of a theme).

    Plan: foreground doc ids come from the postings
    (:func:`matched_docs`, tombstones masked), the corpus is
    doc_id-semi-joined down to just those docs and tokenized ONCE
    (``array_distinct`` before explode, so counts are document
    frequencies), and background df comes from the already-built
    lexicon — the corpus is never scanned or re-tokenized beyond the
    matched subset. ``n_fg`` joins as a broadcast 1-row aggregate, so
    the whole result stays a single lazy plan. Spark reuses the
    matched-set exchange across the count and semi-join branches.

    Caveats: bg statistics are the index's (``stats.n_docs`` and
    lexicon df), i.e. pre-delete until a vacuum rewrites them —
    consistent with how search scoring treats tombstones. Terms absent
    from the lexicon (possible only when ``documents`` is not the
    indexed corpus, or after a df-band prune) are dropped by the
    lexicon join.
    """
    if scorer not in SCORERS:
        raise ValueError(f"scorer must be one of {SCORERS}, got {scorer!r}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = index.spark
    query_terms = sorted(set(parse_query(query_text, synonyms,
                                          index.token_fn())))
    if not query_terms:
        return _empty_df(spark, _SIG_SCHEMA)

    fg = matched_docs(index, query_text, synonyms, mode)
    n_fg = fg.agg(F.count("*").cast("double").alias("n_fg"))

    docs = documents.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    fg_counts = (
        docs.join(fg, "doc_id", "left_semi")
        .select(F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
    )
    lex = index.lexicon.select("term", F.col("df").alias("bg_df"))

    fg_pct = F.col("fg_df") / F.col("n_fg")
    bg_pct = F.col("bg_df") / F.lit(float(index.stats.n_docs))
    return (
        fg_counts.join(lex, "term")
        .crossJoin(F.broadcast(n_fg))
        .where(
            (F.col("fg_df") >= min_fg_df) & ~F.col("term").isin(query_terms)
        )
        .select(
            "term",
            F.col("fg_df").cast("bigint").alias("fg_df"),
            F.col("bg_df").cast("bigint").alias("bg_df"),
            F.round(_sig_score(scorer, fg_pct, bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def significant_terms_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 20,
    *,
    min_fg_df: int = 2,
    scorer: str = "jlh",
    synonyms: dict[str, str] | None = None,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive no-index baseline for :func:`significant_terms`:
    foreground from a corpus-scan match, background df and corpus size
    recomputed from the same scan. The correctness reference for the
    indexed path and the DuckDB-oracle-comparable form."""
    if scorer not in SCORERS:
        raise ValueError(f"scorer must be one of {SCORERS}, got {scorer!r}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    query_terms = sorted(set(parse_query(query_text, synonyms)))
    if not query_terms:
        return _empty_df(docs.sparkSession, _SIG_SCHEMA)

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    fg = matched_docs_dataframe(base, query_text, synonyms, mode)
    n_fg = fg.agg(F.count("*").cast("double").alias("n_fg"))
    n_bg = base.agg(F.count("*").cast("double").alias("n_bg"))

    dt = base.select(
        "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term")
    )
    fg_counts = (
        dt.join(fg, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
    )
    bg_counts = dt.groupBy("term").agg(F.count("*").alias("bg_df"))

    fg_pct = F.col("fg_df") / F.col("n_fg")
    bg_pct = F.col("bg_df") / F.col("n_bg")
    return (
        fg_counts.join(bg_counts, "term")
        .crossJoin(F.broadcast(n_fg))
        .crossJoin(F.broadcast(n_bg))
        .where(
            (F.col("fg_df") >= min_fg_df) & ~F.col("term").isin(query_terms)
        )
        .select(
            "term",
            F.col("fg_df").cast("bigint").alias("fg_df"),
            F.col("bg_df").cast("bigint").alias("bg_df"),
            F.round(_sig_score(scorer, fg_pct, bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


# ------------------------------------------------------------- date histogram

# ES calendar_interval -> (Spark/DuckDB date_trunc unit, grid step).
# Calendar units are VARIABLE width (months are 28-31 days, years
# 365-366), which is exactly what the fixed-interval
# query_exec.histogram_facets cannot express.
_CALENDAR_STEPS = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 days",
    "month": "interval 1 month",
    "quarter": "interval 3 months",
    "year": "interval 1 year",
}


def date_histogram(
    df: DataFrame,
    ts_col: str,
    interval: str = "day",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``date_histogram`` (``calendar_interval``) aggregation:
    one bucket per calendar unit — ``date_trunc(interval, ts)`` —
    with row counts. Both engines truncate weeks to Monday and
    handle variable-width months/quarters/years identically, so the
    bucket keys are oracle-exact.

    ``min_doc_count=0`` fills interior gaps with empty buckets (ES
    semantics): the grid comes from one min/max aggregation +
    ``sequence(lo, hi, step)`` explode — bounded by the bucket span,
    never the data size.

    100 TB shape: one partial-aggregated groupBy on the truncated
    key; output is |buckets| rows regardless of input size. A
    time-partitioned table (e.g. Iceberg ``days(warc_ts)``) makes the
    truncation align with partition boundaries, so the partial aggs
    are partition-local.
    """
    if interval not in _CALENDAR_STEPS:
        raise ValueError(
            f"interval must be one of {sorted(_CALENDAR_STEPS)}, "
            f"got {interval!r}"
        )
    key = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(key)
        .agg(F.count("*").alias("n_docs"))
    )
    if min_doc_count > 1:
        counts = counts.where(F.col("n_docs") >= min_doc_count)
    if min_doc_count == 0:
        step = _CALENDAR_STEPS[interval]
        span = counts.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        grid = (
            span.where(F.col("lo").isNotNull())
            .select(
                F.explode(
                    F.expr(f"sequence(lo, hi, {step})")
                ).alias("bucket")
            )
        )
        counts = grid.join(counts, "bucket", "left").select(
            "bucket", F.coalesce("n_docs", F.lit(0)).alias("n_docs")
        )
    return counts


def date_histogram_facet(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    interval: str = "day",
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``date_histogram`` over SEARCH HITS (the publish-date
    timeline a search UI renders): semi-join doc metadata to the
    matched doc_id set, then :func:`date_histogram`. Same plan shape
    as the other hit facets — output is |buckets| rows."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    return date_histogram(hits, col, interval, min_doc_count)
