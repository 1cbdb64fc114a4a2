"""Faceting over a matched-docs set: terms / histogram / range /
stats / percentiles / cardinality / top-hits aggregations joined
against the documents table. Split from query_exec.py (round 4,
file-size hygiene); public names remain importable from
``operators.query_exec``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def facet_counts(
    matched: DataFrame,
    documents: DataFrame,
    facet_cols: list[str],
    size: int | None = None,
    min_doc_count: int = 1,
    include=None,
    exclude=None,
    missing: str | None = None,
) -> DataFrame:
    """Search-result faceting: per-facet-value matched-document counts
    (the sidebar a search UI renders next to results). ``matched`` is
    any doc_id set — :func:`matched_docs` (indexed),
    :func:`matched_docs_dataframe`, or a filtered variant.

    ES terms-agg key filters (single-facet only): ``include`` /
    ``exclude`` take a value list or a whole-key-anchored regex
    string (``"sp.*"`` matches ``spark``, not a substring — ES
    semantics); exclude wins on overlap. ``missing`` replaces null
    keys with the given value (ES ``missing`` param; by default null
    keys are dropped by the groupBy as a null bucket). All three
    compile to codegen'd predicates BESIDE the scan, before the
    aggregation ever sees the row.

    Plan: left-semi join metadata to the matched set on doc_id, then
    partial-aggregated groupBy on the facet columns — the output is
    |facet-cardinality| rows regardless of corpus size. At scale the
    semi-join shuffles both sides on doc_id unless the metadata table
    is bucketed/sharded by doc_id (the index's own doc_stats layout),
    in which case it co-locates.
    """
    if not facet_cols:
        raise ValueError("facet_cols must name at least one column")
    if (include is not None or exclude is not None or missing is not None) \
            and len(facet_cols) != 1:
        raise ValueError(
            "include/exclude/missing apply to single-facet terms aggs"
        )
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    if missing is not None:
        c = facet_cols[0]
        hits = hits.withColumn(
            c, F.coalesce(F.col(c).cast("string"), F.lit(str(missing)))
        )

    def _key_pred(spec, col):
        if isinstance(spec, (list, tuple, set)):
            return col.isin([str(v) for v in spec])
        # ES anchors include/exclude regexes to the whole key
        return col.rlike(f"^(?:{spec})$")

    if include is not None:
        hits = hits.where(
            _key_pred(include, F.col(facet_cols[0]).cast("string")))
    if exclude is not None:
        hits = hits.where(
            ~_key_pred(exclude, F.col(facet_cols[0]).cast("string")))
    out = hits.groupBy(*facet_cols).agg(F.count("*").alias("n_docs"))
    if min_doc_count > 1:
        out = out.where(F.col("n_docs") >= min_doc_count)
    if size is not None:
        # ES terms-agg page: top-`size` buckets by (count desc, key
        # asc) — a TakeOrdered over the |buckets|-row aggregate, never
        # a full sort (walk ALL buckets with composite_agg instead)
        out = out.orderBy(
            F.col("n_docs").desc(),
            *[F.col(c).asc() for c in facet_cols],
        ).limit(int(size))
    return out

def histogram_facets(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    interval: float,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``histogram`` aggregation over search hits: fixed-width
    buckets ``key = floor(x / interval) * interval`` with matched-doc
    counts — the price/length/date slider a search UI renders.
    ``min_doc_count=0`` fills interior gaps with empty buckets (ES
    semantics): the bucket keys come from one min/max aggregation +
    ``sequence`` explode — bounded by the bucket span, never the
    corpus. Plan: semi-join + one partial-aggregated groupBy on the
    bucket key; output is |buckets| rows regardless of corpus size."""
    if interval <= 0:
        raise ValueError("interval must be positive")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    key = (
        F.floor(F.col(col).cast("double") / F.lit(float(interval)))
        * F.lit(float(interval))
    ).alias("bucket")
    counts = (
        hits.where(F.col(col).isNotNull())
        .groupBy(key)
        .agg(F.count("*").alias("n_docs"))
    )
    if min_doc_count > 1:
        counts = counts.where(F.col("n_docs") >= min_doc_count)
    if min_doc_count == 0:
        span = counts.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        grid = span.where(F.col("lo").isNotNull()).select(
            F.explode(
                F.sequence(
                    (F.col("lo") / interval).cast("long"),
                    (F.col("hi") / interval).cast("long"),
                )
            ).alias("step")
        ).select((F.col("step") * F.lit(float(interval))).alias("bucket"))
        counts = grid.join(counts, "bucket", "left").select(
            "bucket", F.coalesce("n_docs", F.lit(0)).alias("n_docs")
        )
    return counts

def range_facets(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    ranges: list[tuple],
) -> DataFrame:
    """ES ``range`` aggregation over search hits: per-range matched-doc
    counts for [from, to) ranges (from inclusive, to exclusive, either
    side open with ``None``) — ranges MAY overlap, each is counted
    independently, exactly ES's semantics. ``ranges`` is a list of
    ``(label, lo, hi)``. One semi-join + one aggregation emitting every
    range's conditional count in a single pass (no per-range scans);
    empty ranges report 0."""
    if not ranges:
        raise ValueError("ranges must name at least one (label, lo, hi)")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(col).cast("double")
    aggs = []
    for i, (_label, lo, hi) in enumerate(ranges):
        cond = x.isNotNull()
        if lo is not None:
            cond = cond & (x >= float(lo))
        if hi is not None:
            cond = cond & (x < float(hi))
        # positional internal aliases: labels are user strings and may
        # contain dots/backticks (ES auto keys like "*-200.0"), which
        # F.col() would parse as nested-field paths
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}"))
    wide = hits.agg(*aggs)
    # one wide row -> (label, n_docs) rows, preserving declaration order
    pairs = F.array(
        *[
            F.struct(
                F.lit(str(label)).alias("range_label"),
                F.col(f"_c{i}").cast("long").alias("n_docs"),
            )
            for i, (label, _lo, _hi) in enumerate(ranges)
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.range_label", "r.n_docs"
    )

def stats_facet(matched: DataFrame, documents: DataFrame, col: str) -> DataFrame:
    """ES ``stats`` aggregation over search hits: count/min/max/
    avg/sum of a numeric field across the matched docs — one
    partial-aggregated pass, one output row."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(col).cast("double")
    return hits.agg(
        F.count(x).alias("n_docs"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
        F.round(F.avg(x), 6).alias("avg"),
        F.sum(x).alias("sum"),
    )

def percentiles_facet(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """ES ``percentiles`` aggregation over search hits: one row per
    requested percent with the linearly-interpolated value of ``col``
    across the matched docs. ``exact=True`` computes true percentiles
    (a full sort of the HIT values — fine for hit sets, which are
    df-bounded); ``exact=False`` uses ``percentile_approx`` (bounded
    sketch, map-side combinable — the 100 TB corpus-wide choice, and
    what ES itself does with t-digest). All percents come out of ONE
    aggregation pass."""
    if not percents:
        raise ValueError("percents must name at least one percentile")
    if any(not 0.0 <= float(p) <= 100.0 for p in percents):
        raise ValueError("percents must be in [0, 100]")
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    x = F.col(col).cast("double")
    fracs = F.array(*[F.lit(float(p) / 100.0) for p in percents])
    agg = (
        F.percentile(x, fracs) if exact
        else F.percentile_approx(x, fracs, F.lit(accuracy))
    )
    row = hits.agg(agg.alias("_v"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("percent"),
                F.round(F.col("_v")[i], 6).alias("value"),
            )
            for i, p in enumerate(percents)
        ]
    )
    return row.select(F.explode(pairs).alias("r")).select(
        "r.percent", "r.value"
    )

def cardinality_facet(
    matched: DataFrame,
    documents: DataFrame,
    col: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """ES ``cardinality`` aggregation over search hits: distinct count
    of ``col`` across matched docs. ``exact=True`` is a two-stage
    distinct count (partial distinct per partition, then merge) — the
    oracle-checkable path; ``exact=False`` is HyperLogLog++
    (``approx_count_distinct``, fixed-size sketch, map-side combinable
    — the web-scale choice and ES's own algorithm)."""
    hits = documents.join(matched.select("doc_id"), "doc_id", "left_semi")
    agg = (
        F.countDistinct(F.col(col)) if exact
        else F.approx_count_distinct(F.col(col), rsd)
    )
    return hits.agg(agg.cast("long").alias("cardinality"))

def top_hits_facet(
    scored: DataFrame,
    documents: DataFrame,
    group_col: str,
    n: int = 3,
    ndigits: int = 4,
) -> DataFrame:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation:
    for each value of ``group_col``, the ``n`` best-scoring matched
    docs — "top 3 results per site/language" in one pass. ``scored``
    is a (doc_id, score) frame (:func:`scored_docs` for the full match
    set, or any top-k result).

    Determinism: ranks order by the ROUNDED score (``ndigits``) with
    ascending-id tie-break, so rank assignment replays bit-identically
    in SQL. Scale shape: one keyed join (broadcast when ``scored`` is
    a k-row result) + a window partitioned by group over the hit set —
    per-group state is the group's hit count, df-bounded, never the
    corpus; output is ``n × |groups|`` rows."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("n must be >= 1")
    hits = documents.select("doc_id", group_col).join(
        scored.select("doc_id", "score"), "doc_id"
    )
    sc = F.round(F.col("score"), ndigits)
    w = Window.partitionBy(group_col).orderBy(
        sc.desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("hit_rank", F.row_number().over(w))
        .where(F.col("hit_rank") <= n)
        .select(group_col, "hit_rank", "doc_id", sc.alias("score"))
    )
