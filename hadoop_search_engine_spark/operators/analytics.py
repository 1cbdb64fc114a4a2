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
    fg: DataFrame | None = None,
    background: DataFrame | None = None,
) -> DataFrame:
    """Terms that are unusually frequent in the query's result set
    relative to the whole corpus (Elasticsearch ``significant_terms``).

    ``background`` (optional, ES ``background_filter``): a
    ``(doc_id)`` frame restricting the BACKGROUND to a subset —
    "unusual relative to the same site / same month", not the whole
    corpus. With it, bg document frequencies come from tokenizing the
    background subset (one extra semi-joined tokenize pass; the
    default path reads the prebuilt lexicon and never re-tokenizes)
    and ``n_bg`` is the subset size. Terms outside the background
    subset drop out (bg_df = 0 would divide the ratio scorers), ES
    semantics.

    ``fg`` (optional): a pre-resolved foreground ``(doc_id)`` frame —
    the DSL layer passes its compiled hit set here (which may carry
    metadata filters the plain query text can't express). The query's
    own terms are still excluded when ``query_text`` is given; with
    ``fg`` and an empty ``query_text``, nothing is excluded.

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
    if fg is None:
        if not query_terms:
            return _empty_df(spark, _SIG_SCHEMA)
        fg = matched_docs(index, query_text, synonyms, mode)
    else:
        fg = fg.select("doc_id")
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
    fg_pct = F.col("fg_df") / F.col("n_fg")
    if background is not None:
        bgids = background.select("doc_id")
        bg_counts = (
            docs.join(bgids, "doc_id", "left_semi")
            .select(F.explode(F.array_distinct(
                tokens_col(F.col("text")))).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("bg_df"))
        )
        n_bg = bgids.agg(F.count("*").cast("double").alias("n_bg"))
        scored = (
            fg_counts.join(bg_counts, "term")
            .crossJoin(F.broadcast(n_fg))
            .crossJoin(F.broadcast(n_bg))
        )
        bg_pct = F.col("bg_df") / F.col("n_bg")
    else:
        lex = index.lexicon.select("term", F.col("df").alias("bg_df"))
        scored = fg_counts.join(lex, "term").crossJoin(F.broadcast(n_fg))
        bg_pct = F.col("bg_df") / F.lit(float(index.stats.n_docs))
    return (
        scored.where(
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


# approximate seconds per calendar unit, for the auto-interval pick
# (the ladder mirrors _CALENDAR_STEPS — minute is the finest unit the
# calendar histogram supports)
_AUTO_STEPS = [
    ("minute", 60.0),
    ("hour", 3600.0),
    ("day", 86400.0),
    ("week", 604800.0),
    ("month", 2629800.0),
    ("quarter", 7889400.0),
    ("year", 31557600.0),
]


def auto_date_histogram_facet(
    matched: DataFrame,
    documents: DataFrame,
    field: str,
    buckets: int = 10,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest calendar interval
    that keeps the bucket count at or under ``buckets``, then run the
    ordinary :func:`date_histogram` at it. Output ``(bucket, n_docs,
    interval)`` — the chosen interval rides along as a column, like
    ES reports it.

    The interval pick needs the hit set's time span, which costs ONE
    eager 1-row min/max aggregation before the lazy histogram plan is
    built (ES pays the same pass shard-side). Everything after is the
    standard one-groupBy bucket plan."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(field).cast("timestamp")
    row = hits.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).first()
    schema = "bucket timestamp, n_docs long, interval string"
    if row is None or row["lo"] is None:
        return _empty_df(hits.sparkSession, schema)
    span = (row["hi"] - row["lo"]).total_seconds()
    interval = _AUTO_STEPS[-1][0]
    for name, step in _AUTO_STEPS:
        if span / step + 1.0 <= float(buckets):
            interval = name
            break
    # min_doc_count=0: ES auto buckets are CONTIGUOUS over the span
    # (the pick formula above counts grid slots, not occupied ones)
    return date_histogram(hits, field, interval,
                          min_doc_count=0).withColumn(
        "interval", F.lit(interval)
    )


# ------------------------------------------------------------------ #
# Composite aggregation (paginated bucket enumeration)                #
# ------------------------------------------------------------------ #


def composite_agg(
    df: DataFrame,
    sources: list[tuple],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """Elasticsearch ``composite`` aggregation: enumerate the buckets
    of one or more grouping sources in DETERMINISTIC composite-key
    order, ``size`` at a time, resuming from an ``after`` key — the
    scale path for high-cardinality bucketing. A ``terms`` agg must
    materialize (and at 100 TB, shuffle and spill) every bucket to
    rank them; composite instead streams the bucket space in key
    order with keyset pagination, so each page costs one aggregation
    + a bounded sort, and a consumer can walk ALL buckets of a
    trillion-row table page by page (ES's own bulk-export answer).

    ``sources``: ordered specs, each one of
    ``(name, "terms", field)``,
    ``(name, "histogram", field, interval)``,
    ``(name, "date_histogram", field, calendar_interval)``.
    ``after``: the last composite key of the previous page (tuple in
    source order), exclusive. Rows with a NULL source value are
    skipped (ES default, ``missing_bucket=false``).

    Plan: one partial-aggregated groupBy on the key expressions (the
    keyset predicate prunes BEFORE the shuffle on the resume path),
    then a global top-``size`` by key — TakeOrderedAndProject, never a
    full sort. Output: one column per source name + ``n_docs``.
    """
    if not sources:
        raise ValueError("composite needs at least one source")
    if size < 1:
        raise ValueError("size must be >= 1")
    keys = []
    for spec in sources:
        name, kind = spec[0], spec[1]
        if kind == "terms":
            expr = F.col(spec[2])
        elif kind == "histogram":
            interval = float(spec[3])
            if interval <= 0:
                raise ValueError("histogram interval must be positive")
            expr = (
                F.floor(F.col(spec[2]).cast("double") / interval) * interval
            )
        elif kind == "date_histogram":
            unit = spec[3]
            if unit not in _CALENDAR_STEPS:
                raise ValueError(
                    f"calendar_interval must be one of "
                    f"{sorted(_CALENDAR_STEPS)}, got {unit!r}"
                )
            expr = F.date_trunc(unit, F.col(spec[2]))
        else:
            raise ValueError(f"unknown composite source kind {kind!r}")
        keys.append((name, expr))
    out = df
    for name, expr in keys:
        out = out.where(expr.isNotNull())
    if after is not None:
        if len(after) != len(keys):
            raise ValueError(
                f"after key has {len(after)} values for {len(keys)} sources"
            )
        # keyset predicate: strictly greater in composite-key order —
        # prunes rows before the aggregation shuffle
        pred = F.lit(False)
        eq = F.lit(True)
        for (_n, expr), v in zip(keys, after):
            pred = pred | (eq & (expr > F.lit(v)))
            eq = eq & (expr == F.lit(v))
        out = out.where(pred)
    grouped = out.groupBy(
        *[expr.alias(name) for name, expr in keys]
    ).agg(F.count("*").alias("n_docs"))
    order = [F.col(name).asc() for name, _ in keys]
    return grouped.orderBy(*order).limit(size)


def composite_agg_facet(
    matched: DataFrame,
    documents: DataFrame,
    sources: list[tuple],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """:func:`composite_agg` over SEARCH HITS (semi-join to the
    matched doc_id set first), the ES request shape."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    return composite_agg(hits, sources, size=size, after=after)


# ------------------------------------------------------------------ #
# Bucket metrics (terms + metric sub-aggregations)                    #
# ------------------------------------------------------------------ #

_METRIC_KINDS = ("avg", "sum", "min", "max", "cardinality")


def _metric_expr(kind: str, field: str):
    x = F.col(field).cast("double")
    if kind == "avg":
        return F.round(F.avg(x), 6)
    if kind == "sum":
        return F.sum(x)
    if kind == "min":
        return F.min(x)
    if kind == "max":
        return F.max(x)
    if kind == "cardinality":
        return F.countDistinct(F.col(field)).cast("long")
    raise ValueError(
        f"metric kind must be one of {_METRIC_KINDS}, got {kind!r}"
    )


def terms_metrics_facet(
    matched: DataFrame,
    documents: DataFrame,
    group_field: str,
    metrics: dict[str, tuple[str, str]],
    order: tuple[str, bool] | None = None,
    size: int | None = None,
) -> DataFrame:
    """ES ``terms`` aggregation with metric SUB-aggregations: per
    bucket of ``group_field``, the doc count plus every requested
    metric — ``{"avg_len": ("avg", "n_chars"), "sites":
    ("cardinality", "source")}`` — in ONE partial-aggregated groupBy
    pass (ES evaluates sub-aggs per bucket the same way; there is no
    per-bucket re-query). Output is |buckets| rows × (1 + #metrics)
    columns regardless of corpus size. ``avg`` rounds to 6 dp
    (cross-engine float contract); ``cardinality`` is the exact
    two-stage distinct count.

    ``order``: ES bucket ordering — ``("_count", False)`` (count
    desc, the default when ``size`` is set), ``("_key", True)``, or
    ``("<metric name>", asc)`` to sort buckets by a sub-agg value
    (ES ``"order": {"avg_len": "desc"}``). Ties break by key asc, so
    the cut at ``size`` is deterministic. The sort runs over
    |buckets| rows — a TakeOrdered, never a corpus shuffle."""
    if not metrics:
        raise ValueError("metrics must name at least one (kind, field)")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    aggs = [F.count("*").alias("n_docs")]
    for name, (kind, field) in metrics.items():
        aggs.append(_metric_expr(kind, field).alias(name))
    out = hits.groupBy(group_field).agg(*aggs)
    if order is None and size is None:
        return out
    by, asc = order if order is not None else ("_count", False)
    if by == "_count":
        key = F.col("n_docs")
    elif by == "_key":
        key = F.col(group_field)
    elif by in metrics:
        key = F.col(by)
    else:
        raise ValueError(
            f"order key {by!r} is neither _count, _key, nor a metric"
        )
    out = out.orderBy(
        key.asc() if asc else key.desc(), F.asc(group_field)
    )
    return out if size is None else out.limit(int(size))


def extended_stats_facet(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    sigma: float = 2.0,
) -> DataFrame:
    """ES ``extended_stats`` aggregation over search hits: stats plus
    sum_of_squares, variance (population AND sampling, ES 7.9+ fields),
    std deviation (both), and the ±``sigma`` std-deviation bounds.

    Derived values replay ES's own naive formulas from (count, sum,
    sum of squares) — one aggregation pass, map-side combinable, and
    engine-replayable because the formula (not the engine's built-in
    Welford variance) defines the result. Derived floats round to 6 dp;
    over integer-valued fields the three base sums are exact in double
    (< 2^53) so the output is partitioning- and engine-invariant.
    Non-integer fields inherit summation-order float noise in the last
    bits, exactly as ES documents for its own implementation."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(col).cast("double")
    base = hits.agg(
        F.count(x).alias("n_docs"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
        F.sum(x).alias("sum"),
        F.sum(x * x).alias("sum_of_squares"),
    )
    n = F.col("n_docs").cast("double")
    mean = F.col("sum") / n
    var_pop = F.col("sum_of_squares") / n - mean * mean
    var_samp = F.when(
        n > 1.0,
        (F.col("sum_of_squares") - F.col("sum") * F.col("sum") / n)
        / (n - 1.0),
    )
    std_pop = F.sqrt(var_pop)
    return base.select(
        "n_docs",
        "min",
        "max",
        "sum",
        "sum_of_squares",
        F.round(mean, 6).alias("avg"),
        F.round(var_pop, 6).alias("variance"),
        F.round(var_samp, 6).alias("variance_sampling"),
        F.round(std_pop, 6).alias("std_deviation"),
        F.round(F.sqrt(var_samp), 6).alias("std_deviation_sampling"),
        F.round(mean + sigma * std_pop, 6).alias("std_upper"),
        F.round(mean - sigma * std_pop, 6).alias("std_lower"),
    )


def filters_facet(
    matched: DataFrame,
    documents: DataFrame,
    filters: dict[str, object],
) -> DataFrame:
    """ES ``filters`` aggregation over search hits: one named bucket
    per boolean predicate (Column or SQL string), each counted
    independently in ONE conditional-aggregation pass — the
    possibly-overlapping cousin of ``range_facets`` for arbitrary
    predicates ("how many hits are english / long / recent"). Empty
    buckets report 0; declaration order preserved."""
    if not filters:
        raise ValueError("filters must name at least one predicate")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    aggs = []
    for name, pred in filters.items():
        cond = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(str(name)))
    wide = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(str(name)).alias("filter_label"),
                F.coalesce(F.col(str(name)), F.lit(0))
                .cast("long")
                .alias("n_docs"),
            )
            for name in filters
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.filter_label", "r.n_docs"
    )


def missing_facet(
    matched: DataFrame, documents: DataFrame, col: str
) -> DataFrame:
    """ES ``missing`` aggregation: how many hits lack a value for the
    field — the metadata-coverage check. One conditional count."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    return hits.agg(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing")
    )


def percentile_ranks_facet(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    values: tuple[float, ...],
) -> DataFrame:
    """ES ``percentile_ranks`` (inverse percentiles): for each given
    value, the percentage of hit values <= it — exact (one
    conditional-aggregation pass; ES's own t-digest answer converges
    to this). One row per requested value, declaration order."""
    if not values:
        raise ValueError("values must name at least one cut point")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(col).cast("double")
    aggs = [F.count(x).alias("_n")]
    for i, v in enumerate(values):
        aggs.append(
            F.sum(F.when(x <= float(v), 1).otherwise(0)).alias(f"_c{i}")
        )
    wide = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.round(
                    F.col(f"_c{i}") * 100.0 / F.col("_n"), 6
                ).alias("percent"),
            )
            for i, v in enumerate(values)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.value", "r.percent"
    )


def adjacency_matrix_facet(
    matched: DataFrame,
    documents: DataFrame,
    filters: dict[str, object],
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: hit counts for every named
    predicate AND every pairwise intersection ("en∩long", the
    co-occurrence matrix over result-set segments) in ONE
    conditional-aggregation pass — n + n(n-1)/2 counters, no
    per-pair scan. Keys sorted; intersections labeled ``a&b`` in key
    order (ES's own label form). Empty cells report 0."""
    if not filters:
        raise ValueError("filters must name at least one predicate")
    names = sorted(filters)
    preds = {
        n: (F.expr(p) if isinstance(p, str) else p)
        for n, p in filters.items()
    }
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    cells: list[tuple[str, object]] = [(n, preds[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", preds[a] & preds[b]))
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}")
        for i, (_n, cond) in enumerate(cells)
    ]
    wide = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(label).alias("key"),
                F.coalesce(F.col(f"_c{i}"), F.lit(0))
                .cast("long")
                .alias("n_docs"),
            )
            for i, (label, _c) in enumerate(cells)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.key", "r.n_docs"
    )


# ------------------------------------------------- long-tail / range / metric

def rare_terms_facet(
    matched: DataFrame,
    documents: DataFrame,
    field: str,
    max_doc_count: int = 1,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the LONG-TAIL buckets of
    ``field`` inside the hit set — values appearing in at most
    ``max_doc_count`` matched docs, ordered count ASC then key ASC
    (the mirror image of ``terms``, which shows the head). Null keys
    are skipped (ES ignores missing values unless configured).

    One semi-join + one partial-aggregated groupBy; output is bounded
    by the number of distinct qualifying values, never corpus rows.
    (ES approximates this with a bloom filter per shard; an exact
    groupBy is both cheaper to reason about and exact at any scale —
    the agg output is vocabulary-sized either way.)"""
    if max_doc_count < 1:
        raise ValueError(
            f"max_doc_count must be >= 1, got {max_doc_count}"
        )
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    return (
        hits.where(F.col(field).isNotNull())
        .groupBy(F.col(field).cast("string").alias("key"))
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") <= int(max_doc_count))
        .orderBy(F.asc("n_docs"), F.asc("key"))
    )


def date_range_facet(
    matched: DataFrame,
    documents: DataFrame,
    field: str,
    ranges: list[tuple],
) -> DataFrame:
    """ES ``date_range`` aggregation: per-range matched-doc counts
    over a timestamp field — ``from`` inclusive, ``to`` exclusive,
    either side open with ``None``, ranges may overlap (each counted
    independently, ES semantics). ``ranges`` is ``(label, lo, hi)``
    with ISO-8601 strings (or ``None``). One conditional-aggregation
    pass like :func:`~.query_exec.range_facets`; empty ranges report
    0 and declaration order is preserved."""
    if not ranges:
        raise ValueError("ranges must name at least one (label, lo, hi)")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(field).cast("timestamp")
    aggs = []
    for i, (_label, lo, hi) in enumerate(ranges):
        cond = x.isNotNull()
        if lo is not None:
            cond = cond & (x >= F.to_timestamp(F.lit(str(lo))))
        if hi is not None:
            cond = cond & (x < F.to_timestamp(F.lit(str(hi))))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}"))
    wide = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(str(label)).alias("range_label"),
                F.coalesce(F.col(f"_c{i}"), F.lit(0))
                .cast("long")
                .alias("n_docs"),
            )
            for i, (label, _lo, _hi) in enumerate(ranges)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.range_label", "r.n_docs"
    )


def multi_terms_facet(
    matched: DataFrame,
    documents: DataFrame,
    fields: list[str],
    size: int = 10,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: buckets keyed by a TUPLE of
    fields (e.g. ``(lang, source)``), doc count per composite bucket,
    ordered count DESC then each key ASC, top ``size``. Docs missing
    ANY key field are skipped (ES semantics). One groupBy over the
    composite key + a TakeOrdered — |buckets| rows, map-side
    combinable, never wider than the distinct key-tuple space."""
    if not fields or len(fields) < 2:
        raise ValueError("multi_terms needs at least two fields")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    for f in fields:
        hits = hits.where(F.col(f).isNotNull())
    out = hits.groupBy(*[F.col(f) for f in fields]).agg(
        F.count("*").alias("n_docs")
    )
    if min_doc_count > 1:
        out = out.where(F.col("n_docs") >= int(min_doc_count))
    return out.orderBy(
        F.desc("n_docs"), *[F.asc(f) for f in fields]
    ).limit(int(size))


# ------------------------------------------------- pipeline aggregations
#
# ES pipeline aggregations post-process a PARENT bucket agg's output.
# Every input here is a bucket frame — |buckets| rows, already
# aggregate-sized — so the single-partition Window each helper uses is
# deliberate and cheap: the corpus was reduced by the parent groupBy,
# and the pipeline pass touches only the reduced rows. (The usual
# "window without partitionBy" scale rule targets corpus-sized inputs;
# a bucket timeline is bounded by the calendar span.)


def histogram_metrics_facet(
    matched: DataFrame,
    documents: DataFrame,
    field: str,
    interval: float,
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """ES ``histogram`` bucket agg WITH metric sub-aggregations:
    floor-bucket ``field`` by ``interval``, count plus every
    requested metric per bucket, in one partial-aggregated groupBy
    (same contract as :func:`terms_metrics_facet`). Buckets ordered
    ascending; no gap fill (gap-filled pipelines treat absent buckets
    as absent, matching ES's default gap_policy=skip)."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    bucket = (
        F.floor(F.col(field).cast("double") / float(interval))
        * float(interval)
    ).alias("bucket")
    aggs = [F.count("*").alias("n_docs")]
    for name, (kind, fld) in metrics.items():
        aggs.append(_metric_expr(kind, fld).alias(name))
    return (
        hits.where(F.col(field).isNotNull())
        .groupBy(bucket)
        .agg(*aggs)
        .orderBy("bucket")
    )


def date_histogram_metrics_facet(
    matched: DataFrame,
    documents: DataFrame,
    field: str,
    interval: str,
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """ES ``date_histogram`` WITH metric sub-aggregations: calendar
    buckets (``date_trunc``) plus per-bucket metrics, one groupBy
    pass, buckets ascending."""
    if interval not in _CALENDAR_STEPS:
        raise ValueError(
            f"interval must be one of {sorted(_CALENDAR_STEPS)}, "
            f"got {interval!r}"
        )
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    key = F.date_trunc(interval, F.col(field)).alias("bucket")
    aggs = [F.count("*").alias("n_docs")]
    for name, (kind, fld) in metrics.items():
        aggs.append(_metric_expr(kind, fld).alias(name))
    return (
        hits.where(F.col(field).isNotNull())
        .groupBy(key)
        .agg(*aggs)
        .orderBy("bucket")
    )


def _bucket_window():
    from pyspark.sql import Window

    return Window.orderBy("bucket")


def derivative_col(buckets: DataFrame, value_col: str,
                   out_col: str | None = None) -> DataFrame:
    """ES ``derivative`` pipeline agg: first difference of
    ``value_col`` across consecutive buckets (bucket-key order); the
    first bucket gets null, exactly ES. Appends ``<value>_deriv``."""
    out = out_col or f"{value_col}_deriv"
    w = _bucket_window()
    return buckets.withColumn(
        out,
        F.round(F.col(value_col).cast("double")
                - F.lag(F.col(value_col).cast("double")).over(w), 6),
    )


def cumulative_sum_col(buckets: DataFrame, value_col: str,
                       out_col: str | None = None) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg: running total of
    ``value_col`` in bucket order. Appends ``<value>_cumsum``."""
    from pyspark.sql import Window

    out = out_col or f"{value_col}_cumsum"
    w = _bucket_window().rowsBetween(Window.unboundedPreceding,
                                     Window.currentRow)
    return buckets.withColumn(
        out, F.round(F.sum(F.col(value_col).cast("double")).over(w), 6)
    )


def moving_avg_col(buckets: DataFrame, value_col: str, window: int,
                   out_col: str | None = None) -> DataFrame:
    """ES ``moving_fn`` (unweightedAvg) pipeline agg: mean of the
    PREVIOUS ``window`` buckets' values — shift 0, current bucket
    excluded, exactly ES's default window placement; buckets with no
    history yet get null. Appends ``<value>_mavg``."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    out = out_col or f"{value_col}_mavg"
    w = _bucket_window().rowsBetween(-window, -1)
    return buckets.withColumn(
        out, F.round(F.avg(F.col(value_col).cast("double")).over(w), 6)
    )


def serial_diff_col(buckets: DataFrame, value_col: str, lag: int = 1,
                    out_col: str | None = None) -> DataFrame:
    """ES ``serial_diff`` pipeline agg: ``value - value[lag buckets
    ago]`` (lag 1 == derivative; higher lags expose seasonality).
    The first ``lag`` buckets get null. Appends ``<value>_sdiff``."""
    if lag <= 0:
        raise ValueError(f"lag must be positive, got {lag}")
    out = out_col or f"{value_col}_sdiff"
    w = _bucket_window()
    x = F.col(value_col).cast("double")
    return buckets.withColumn(
        out, F.round(x - F.lag(x, lag).over(w), 6)
    )


def stats_bucket(buckets: DataFrame, value_col: str) -> DataFrame:
    """ES ``stats_bucket`` sibling pipeline agg: count/min/max/avg/sum
    of a metric ACROSS the sibling's buckets — one row over |buckets|
    rows, nulls skipped (gap_policy=skip)."""
    x = F.col(value_col).cast("double")
    return buckets.agg(
        F.count(x).alias("n_buckets"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
        F.round(F.avg(x), 6).alias("avg"),
        F.round(F.sum(x), 6).alias("sum"),
    )


def percentiles_bucket(
    buckets: DataFrame,
    value_col: str,
    percents: tuple = (25.0, 50.0, 75.0),
) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline agg: exact
    linear-interpolation percentiles of a metric across the sibling's
    buckets. Output ``(percent, value)`` rows in declaration order —
    |percents| rows computed from |buckets| inputs."""
    if not percents:
        raise ValueError("percents must name at least one percentile")
    x = F.col(value_col).cast("double")
    wide = buckets.agg(
        *[
            F.round(F.percentile(x, F.lit(p / 100.0)), 6).alias(f"_p{i}")
            for i, p in enumerate(percents)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("percent"),
                F.col(f"_p{i}").alias("value"),
            )
            for i, p in enumerate(percents)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.percent", "r.value"
    )


def _compile_bucket_script(script: str, bindings: dict) -> "F.Column":
    """Compile the painless-arithmetic SUBSET ES bucket_script /
    bucket_selector actually get used with — ``params.x`` references,
    numeric literals, ``+ - * /``, unary minus, comparisons, and
    ``and``/``or`` — into a Spark Column via the Python ast (no eval,
    no attribute access beyond ``params.<name>``, anything else is
    rejected loudly). Division is float (painless semantics on
    doubles)."""
    import ast

    def comp(node):
        if isinstance(node, ast.Expression):
            return comp(node.body)
        if isinstance(node, ast.Constant) and isinstance(
                node.value, (int, float)):
            return F.lit(float(node.value))
        if isinstance(node, ast.Attribute):
            if (isinstance(node.value, ast.Name)
                    and node.value.id == "params"
                    and node.attr in bindings):
                return bindings[node.attr].cast("double")
            raise ValueError(
                f"only params.<bound name> references are allowed, "
                f"got {ast.dump(node)}"
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -comp(node.operand)
        if isinstance(node, ast.BinOp):
            l, r = comp(node.left), comp(node.right)
            if isinstance(node.op, ast.Add):
                return l + r
            if isinstance(node.op, ast.Sub):
                return l - r
            if isinstance(node.op, ast.Mult):
                return l * r
            if isinstance(node.op, ast.Div):
                return l / r
            raise ValueError(f"operator {node.op!r} not allowed")
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError("chained comparisons not allowed")
            l, r = comp(node.left), comp(node.comparators[0])
            op = node.ops[0]
            if isinstance(op, ast.Gt):
                return l > r
            if isinstance(op, ast.GtE):
                return l >= r
            if isinstance(op, ast.Lt):
                return l < r
            if isinstance(op, ast.LtE):
                return l <= r
            if isinstance(op, ast.Eq):
                return l == r
            if isinstance(op, ast.NotEq):
                return l != r
            raise ValueError(f"comparison {op!r} not allowed")
        if isinstance(node, ast.BoolOp):
            parts = [comp(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) \
                    else (out | p)
            return out
        raise ValueError(
            f"unsupported script construct {type(node).__name__}"
        )

    try:
        tree = ast.parse(script, mode="eval")
    except SyntaxError as exc:
        raise ValueError(f"bad bucket script {script!r}: {exc}") from exc
    return comp(tree)


def bucket_script_col(
    buckets: DataFrame,
    bindings: dict[str, str],
    script: str,
    out_col: str,
) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: a computed per-bucket metric
    from sibling metrics — the CTR / ratio column (``params.clicks /
    params.views``). ``bindings`` maps script names to bucket-frame
    columns (``_count`` → ``n_docs``). Pure column arithmetic appended
    to the bucket-sized frame; result rounds to 6 dp (cross-engine
    float contract)."""
    cols = {
        k: F.col("n_docs" if v == "_count" else v)
        for k, v in bindings.items()
    }
    return buckets.withColumn(
        out_col, F.round(_compile_bucket_script(script, cols), 6)
    )


def bucket_selector(
    buckets: DataFrame,
    bindings: dict[str, str],
    script: str,
) -> DataFrame:
    """ES ``bucket_selector`` pipeline agg: keep only buckets where
    the boolean script holds (``params.total > 100`` — the HAVING
    clause of the agg world). A codegen'd filter over the bucket
    frame."""
    cols = {
        k: F.col("n_docs" if v == "_count" else v)
        for k, v in bindings.items()
    }
    return buckets.where(_compile_bucket_script(script, cols))


def bucket_anomalies(
    buckets: DataFrame,
    value_col: str,
    window: int = 7,
    z: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly flags over a bucket frame (the
    ops alert on a rollup/date_histogram timeline): for each bucket,
    the mean and population-stddev of the PREVIOUS ``window`` buckets'
    values (current excluded — an anomaly must not mask itself), and
    ``is_anomaly`` when ``|value - mean| > z * stddev``. Buckets with
    fewer than 2 trailing values, or zero trailing variance, are
    never flagged (no basis). Appends ``trail_mean`` / ``trail_std``
    (6 dp) / ``is_anomaly``; window passes over the bucket-sized
    frame only."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if z <= 0:
        raise ValueError(f"z must be positive, got {z}")
    w = _bucket_window().rowsBetween(-window, -1)
    x = F.col(value_col).cast("double")
    # both stats 0.0 when undefined (no history): the flag guards on
    # n >= 2 anyway, and non-null columns compare across engines
    mean = F.coalesce(F.avg(x).over(w), F.lit(0.0))
    std = F.coalesce(F.stddev_pop(x).over(w), F.lit(0.0))
    n = F.count(x).over(w)
    flag = (
        (n >= 2) & (std > 0.0)
        & (F.abs(x - mean) > F.lit(float(z)) * std)
    )
    return (
        buckets.withColumn("trail_mean", F.round(mean, 6))
        .withColumn("trail_std", F.round(std, 6))
        .withColumn("is_anomaly", flag)
    )


SIBLING_STATS = ("max_bucket", "min_bucket", "avg_bucket", "sum_bucket")


def sibling_bucket_stat(buckets: DataFrame, value_col: str,
                        kind: str) -> DataFrame:
    """ES sibling pipeline aggs (``max_bucket`` / ``min_bucket`` /
    ``avg_bucket`` / ``sum_bucket``): one row summarizing a metric
    ACROSS a sibling agg's buckets. ``max_bucket``/``min_bucket``
    also report which bucket(s) — ES's ``keys`` list, here the tied
    buckets' keys as a sorted comma-joined string (hashable for the
    cross-engine contract). Null metric values are skipped
    (gap_policy=skip). One aggregation over |buckets| rows."""
    if kind not in SIBLING_STATS:
        raise ValueError(
            f"kind must be one of {SIBLING_STATS}, got {kind!r}"
        )
    x = F.col(value_col).cast("double")
    if kind == "avg_bucket":
        return buckets.agg(F.round(F.avg(x), 6).alias("value"))
    if kind == "sum_bucket":
        return buckets.agg(F.round(F.sum(x), 6).alias("value"))
    extreme = F.max(x) if kind == "max_bucket" else F.min(x)
    ext = buckets.agg(extreme.alias("value"))
    return (
        buckets.join(F.broadcast(ext), F.col(value_col).cast("double")
                     == F.col("value"))
        .groupBy("value")
        .agg(F.array_join(
            F.sort_array(F.collect_list(F.col("bucket").cast("string"))),
            ",").alias("keys"))
        .select("value", "keys")
    )


def top_metrics_facet(
    matched: DataFrame,
    documents: DataFrame,
    metric_fields: list[str],
    sort_field: str,
    ascending: bool = False,
    size: int = 1,
) -> DataFrame:
    """ES ``top_metrics`` aggregation: the metric field values taken
    from the ``size`` hit docs with the largest (or smallest)
    ``sort_field`` — "what's the score/length/lang of the newest
    matched doc". Output: ``(sort_value, <metric fields...>)`` rows in
    sort order, doc_id asc tie-break (deterministic where ES leaves
    ties undefined). Nulls sort last. One semi-join + a
    TakeOrderedAndProject — k rows, never a global sort."""
    if not metric_fields:
        raise ValueError("metric_fields must name at least one field")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    s = F.col(sort_field)
    key = s.asc_nulls_last() if ascending else s.desc_nulls_last()
    return (
        hits.orderBy(key, F.asc("doc_id"))
        .limit(int(size))
        .select(s.alias("sort_value"), *[F.col(f) for f in metric_fields])
    )


SINGLE_METRICS = ("avg", "sum", "min", "max", "value_count",
                  "weighted_avg")


def single_metric_facet(
    matched: DataFrame,
    documents: DataFrame,
    kind: str,
    field: str,
    weight_field: str | None = None,
) -> DataFrame:
    """ES single-value metric aggregations at the TOP level of the
    aggs body — ``avg``/``sum``/``min``/``max``/``value_count``/
    ``weighted_avg`` over a numeric field of the hit set. One row
    ``(value)``. ``value_count`` counts non-null values;
    ``weighted_avg`` is ``sum(v*w)/sum(w)`` over rows where BOTH value
    and weight are non-null (ES skips them). ``avg``/``weighted_avg``
    round to 6 dp (the cross-engine float contract); the rest are
    exact. One semi-join + one 1-row aggregate — nothing scales past
    the scan."""
    if kind not in SINGLE_METRICS:
        raise ValueError(
            f"kind must be one of {SINGLE_METRICS}, got {kind!r}"
        )
    if kind == "weighted_avg" and not weight_field:
        raise ValueError("weighted_avg needs weight_field")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(field).cast("double")
    if kind == "value_count":
        expr = (
            F.sum(F.when(F.col(field).isNotNull(), 1).otherwise(0))
            .cast("long")
        )
    elif kind == "weighted_avg":
        w = F.col(weight_field).cast("double")
        ok = F.col(field).isNotNull() & F.col(weight_field).isNotNull()
        expr = F.round(
            F.sum(F.when(ok, x * w)) / F.sum(F.when(ok, w)), 6
        )
    elif kind == "avg":
        expr = F.round(F.avg(x), 6)
    elif kind == "sum":
        expr = F.sum(x)
    elif kind == "min":
        expr = F.min(x)
    else:
        expr = F.max(x)
    return hits.agg(expr.alias("value"))
