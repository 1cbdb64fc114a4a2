"""Corpus curation pipeline: the end-to-end training-data shape.

Composes the curation operators into the standard web-corpus pipeline
(quality-filter -> exact dedup -> near dedup), entirely out of the
already-tested pieces — and entirely DuckDB-oracle-checkable, because
every stage's hash family replays in SQL (functions.hashes):

1. **annotate + filter** — token count, heuristic language id, quality
   score, murmur fingerprint (text_analysis.analyze: ONE projection,
   JVM expressions); keep docs with ``n_tokens`` in
   ``[min_tokens, max_tokens]``, ``quality >= min_quality``, and
   ``lang_pred`` in ``langs``.
2. **exact dedup** — md5-digest groupBy, keep the lowest doc_id per
   digest (16-byte shuffle keys, never document bodies).
3. **near dedup** — MinHash-LSH pairs over the exact-dedup survivors
   (banded equi-join, never all-pairs); GREEDY drop: a doc is removed
   when ANY surviving-stage doc with a SMALLER id is a near-dup of it
   (one anti-join on the pair's ``b`` side). One pass, deterministic,
   order-free — the standard web-pipeline variant of duplicate-cluster
   collapse (a full connected-components pass would need iteration;
   greedy-by-id keeps exactly one representative per pairwise-linked
   chain when similarity is transitive, and errs toward keeping docs
   when it is not).

Scale shape: stage 1 is a map-only projection; stage 2 shuffles
digests; stage 3 shuffles (band, band_hash) keys and k-row pair sets;
the final anti-join broadcasts the (small) drop set when it fits. No
stage materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs
from .text_analysis import analyze

LANGS_DEFAULT = ("en", "es")


def curate_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = LANGS_DEFAULT,
    near_threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents -> curated documents with annotation columns
    (``n_tokens``, ``lang_pred``, ``quality``, ``fingerprint``).

    Returns the surviving rows of ``docs`` (all original columns
    preserved) plus the annotations; see module docstring for the
    three stages and their exact semantics.
    """
    ann = analyze(docs, text_col=text_col, id_col=id_col).drop("n_subwords")
    annotated = docs.join(ann, id_col)
    stage1 = annotated.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
        & F.col("lang_pred").isin(list(langs))
    )

    # exact dedup: lowest id per byte-identical text
    winners = (
        stage1.select(F.col(id_col), F.md5(F.col(text_col)).alias("_digest"))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    stage2 = stage1.join(winners, id_col, "left_semi")

    # near dedup: drop every doc with a smaller-id near-dup among the
    # stage-2 survivors
    pairs = minhash_lsh_pairs(
        stage2, n_hashes=n_hashes, bands=bands,
        threshold=near_threshold, text_col=text_col, id_col=id_col,
    )
    drops = pairs.select(F.col("b").alias(id_col)).distinct()
    return stage2.join(drops, id_col, "left_anti")


def curation_report(docs: DataFrame, curated: DataFrame) -> dict:
    """Small summary dict (two count actions + one agg) for lineage
    logs: input/output doc counts and surviving token volume."""
    n_in = docs.count()
    row = curated.agg(
        F.count("*").alias("n_out"),
        F.sum("n_tokens").alias("tokens_out"),
    ).collect()[0]
    n_out = int(row["n_out"])
    return {
        "docs_in": int(n_in),
        "docs_out": n_out,
        "dropped": int(n_in) - n_out,
        "tokens_out": int(row["tokens_out"] or 0),
    }


DEFAULT_SPLITS = (("train", 0.9), ("val", 0.05), ("test", 0.05))
SPLIT_BUCKETS = 10_000


def split_corpus(
    docs: DataFrame,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column from
    a salted murmur3 of the document id — the reproducible-split shape
    a training pipeline needs at 100 TB. Unlike ``randomSplit`` /
    ``sample`` (plan- and partitioning-dependent RNG), the assignment
    is a PURE FUNCTION of (id, salt): stable across reruns, cluster
    sizes, repartitioning, and engines (``functions.hashes`` replays
    the hash bit-exactly in DuckDB SQL, so the split is on the oracle
    board), and adding corpus later never reshuffles earlier docs
    between splits. Map-only projection — no shuffle, no sampling job.

    ``splits``: ordered (name, weight) pairs, weights summing to 1;
    each doc lands in bucket ``murmur3(id, salt) % 10000`` and the
    buckets partition by cumulative weight (so weights are exact to
    1/10000 — corpus-scale splits are within ~1% of target even at
    tiny corpora, exactly at large N by uniformity of murmur3).
    """
    from ..functions.hashes import murmur3_u32

    total = sum(w for _n, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = F.pmod(
        murmur3_u32(F.col(id_col).cast("string"), salt=salt),
        F.lit(SPLIT_BUCKETS),
    )
    acc = 0.0
    expr = None
    cuts: list[tuple[str, int]] = []
    for name, w in splits:
        acc += w
        cuts.append((name, int(round(acc * SPLIT_BUCKETS))))
    cuts[-1] = (cuts[-1][0], SPLIT_BUCKETS)  # close the last interval
    for name, hi in reversed(cuts):
        expr = (
            F.lit(name) if expr is None
            else F.when(bucket < hi, F.lit(name)).otherwise(expr)
        )
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float] | float,
    strata_col: str | None = None,
    default_rate: float = 0.0,
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic (stratified) corpus sampling: keep each doc iff
    ``murmur3(id, salt) % 10000 < rate(stratum) * 10000`` — the
    language/source rebalancing step of a training-data mix ("keep 10%
    of English, all of Swahili"). Like :func:`split_corpus`, the keep
    decision is a PURE FUNCTION of (id, salt): reproducible across
    reruns, cluster sizes, partitioning, and engines (murmur3 replays
    bit-exactly in DuckDB SQL), and — unlike ``DataFrame.sample`` —
    stable under corpus growth: a doc's fate never changes when
    neighbors are added. Nested property: a rate-0.05 sample with the
    same salt is a SUBSET of the rate-0.10 sample (bucket thresholding),
    so down-sampling experiments nest. Map-only filter — no shuffle, no
    sampling job; at 100 TB the filter runs beside the parquet scan.

    ``rates``: a single float for uniform sampling, or a
    {stratum value -> rate} dict keyed by ``strata_col`` values
    (missing strata fall back to ``default_rate``). Rates are exact to
    1/10000 by bucket granularity.
    """
    from ..functions.hashes import murmur3_u32

    def _check(r) -> float:
        r = float(r)
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate must be in [0, 1], got {r}")
        return r

    bucket = F.pmod(
        murmur3_u32(F.col(id_col).cast("string"), salt=salt),
        F.lit(SPLIT_BUCKETS),
    )
    if isinstance(rates, dict):
        if strata_col is None:
            raise ValueError("per-stratum rates need strata_col")
        thr = F.lit(int(round(_check(default_rate) * SPLIT_BUCKETS)))
        for val, r in sorted(rates.items()):
            thr = F.when(
                F.col(strata_col) == val,
                F.lit(int(round(_check(r) * SPLIT_BUCKETS))),
            ).otherwise(thr)
    else:
        thr = F.lit(int(round(_check(rates) * SPLIT_BUCKETS)))
    return docs.where(bucket < thr)


def _weight_buckets(
    weights: dict[str, float] | float,
    strata_col: str | None,
    default_weight: float,
):
    """Per-row quantized weight (weight * SPLIT_BUCKETS) as an int
    column — the shared stratum CASE of the mixing family."""

    def _check(w) -> float:
        w = float(w)
        if w < 0.0:
            raise ValueError(f"weight must be >= 0, got {w}")
        return w

    if isinstance(weights, dict):
        if strata_col is None:
            raise ValueError("per-stratum weights need strata_col")
        wq = F.lit(int(round(_check(default_weight) * SPLIT_BUCKETS)))
        for val, w in sorted(weights.items()):
            wq = F.when(
                F.col(strata_col) == val,
                F.lit(int(round(_check(w) * SPLIT_BUCKETS))),
            ).otherwise(wq)
        return wq
    return F.lit(int(round(_check(weights) * SPLIT_BUCKETS)))


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float] | float,
    strata_col: str | None = None,
    default_weight: float = 0.0,
    salt: str = "mix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-recipe epoch mixing: weight ``w`` means each doc of
    that stratum appears ``floor(w)`` times (``epoch`` 0..floor(w)-1)
    plus once more at ``epoch == floor(w)`` iff its deterministic
    ``murmur3(f"{id}:{epoch}", salt) % 10000`` bucket clears the
    fractional part — "2 epochs of wiki, 0.3 of common-crawl" as one
    declarative op. Appends an ``epoch`` int column; weight-0 strata
    vanish (explode of an empty epoch list).

    Same determinism family as :func:`stratified_sample`: the epoch
    set is a PURE FUNCTION of (id, salt, weight) — reproducible across
    reruns, partitionings, and engines (the DuckDB oracle replays the
    hash bit-exactly), stable under corpus growth, and NESTED: raising
    a stratum's weight only ever ADDS (doc, epoch) rows — the mixes of
    an ablation ladder are supersets of each other, never resamples.

    Scale shape: map-only — the stratum CASE, the per-epoch hash, and
    the explode all run beside the scan; no shuffle, no sampling job.
    Epoch multiplicity lands in the OUTPUT row count only (exactly
    what a downstream :func:`~..training.pack_spans` run expects —
    give it ``(doc_id, epoch)`` composite ids upstream)."""
    from ..functions.hashes import murmur3_u32

    wq = _weight_buckets(weights, strata_col, default_weight)
    n_full = F.floor(wq / F.lit(SPLIT_BUCKETS)).cast("int")
    rem = F.pmod(wq, F.lit(SPLIT_BUCKETS))
    idstr = F.col(id_col).cast("string")
    epochs = F.filter(
        F.sequence(F.lit(0), n_full),
        lambda e: (e < n_full)
        | (
            F.pmod(
                murmur3_u32(
                    F.concat(idstr, F.lit(":"), e.cast("string")),
                    salt=salt,
                ),
                F.lit(SPLIT_BUCKETS),
            )
            < rem
        ),
    )
    return docs.select("*", F.explode(epochs).alias("epoch"))


def sql_mix_epochs_duckdb(
    weights: dict[str, float] | float,
    strata_col: str | None = None,
    default_weight: float = 0.0,
    salt: str = "mix",
    id_expr: str = "doc_id",
) -> tuple[str, str]:
    """(epoch-list SELECT fragment, keep predicate) replaying
    :func:`mix_corpus` in DuckDB: use as
    ``SELECT ..., unnest(range(0, {wq} // 10000 + 1)) AS epoch``
    then ``WHERE {pred}``."""
    from ..functions.hashes import sql_murmur3_u32_duckdb

    def _q(w) -> int:
        return int(round(float(w) * SPLIT_BUCKETS))

    if isinstance(weights, dict):
        if strata_col is None:
            raise ValueError("per-stratum weights need strata_col")
        wq = "CASE"
        for val, w in sorted(weights.items()):
            wq += f" WHEN {strata_col} = '{val}' THEN {_q(w)}"
        wq += f" ELSE {_q(default_weight)} END"
        wq = f"({wq})"
    else:
        wq = str(_q(weights))
    h1 = sql_murmur3_u32_duckdb(
        f"(({id_expr})::varchar || ':' || epoch::varchar)"
    )
    h = sql_murmur3_u32_duckdb(f"'{salt}'", seed=h1)
    pred = (
        f"(epoch < {wq} // {SPLIT_BUCKETS}"
        f" OR (({h}) % {SPLIT_BUCKETS}) < ({wq} % {SPLIT_BUCKETS}))"
    )
    return wq, pred


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: which training docs share word
    n-grams with an evaluation set (the contamination check every
    LLM training pipeline runs before training — GPT-3 §C / PaLM-style
    n-gram overlap). Returns one row per contaminated train doc:
    ``(doc_id, n_shingles, overlap, rate)`` where ``overlap`` counts
    the doc's DISTINCT n-grams that appear anywhere in the eval set
    and ``rate = overlap / n_shingles``.

    Scale shape: eval sets are tiny next to a 100 TB corpus, so the
    eval n-gram set is broadcast (``broadcast_eval``) — the probe is a
    map-side hash join running beside the train-side tokenize, and the
    only shuffle is the per-doc overlap count on 8-byte doc_id keys.
    Set ``broadcast_eval=False`` for a giant eval union (falls back to
    a shingle-key shuffle join). Docs shorter than ``n`` tokens have
    no n-grams and are never flagged.
    """
    from .dedup import shingles

    tr = shingles(train, n=n, text_col=text_col, id_col=id_col)
    ev = (
        shingles(eval_docs, n=n, text_col=text_col, id_col=id_col)
        .select("shingle").distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    sizes = tr.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    ov = (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap"))
        .where(F.col("overlap") >= min_overlap)
    )
    return ov.join(sizes, id_col).select(
        id_col, "n_shingles", "overlap",
        F.round(F.col("overlap") / F.col("n_shingles"), 6).alias("rate"),
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    max_rate: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop train docs whose eval n-gram overlap rate EXCEEDS
    ``max_rate`` (default 0.0: any shared n-gram disqualifies).
    Anti-join of ``train`` against the flagged id set — all original
    columns preserved."""
    flagged = contamination_report(
        train, eval_docs, n=n, min_overlap=1,
        text_col=text_col, id_col=id_col,
        broadcast_eval=broadcast_eval,
    ).where(F.col("rate") > max_rate).select(id_col)
    return train.join(flagged, id_col, "left_anti")


def dedup_lines(
    docs: DataFrame,
    max_line_df: int = 1,
    mode: str = "keep_first",
    delim: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Repeated-line (boilerplate) removal, the CCNet/C4 curation
    stage: split each doc into lines, count each distinct line's
    document frequency across the WHOLE corpus, and drop over-frequent
    lines — navbars, cookie banners, licence footers — then rebuild
    the text from the surviving lines in original order. Docs whose
    every line is dropped disappear from the output.

    ``mode``:
      * ``"keep_first"`` — a line with df > ``max_line_df`` survives
        only at its globally first occurrence (smallest (doc_id, pos));
        CCNet's keep-one-copy paragraph dedup.
      * ``"drop_all"`` — every copy of an over-frequent line is
        removed (C4's "discard lines appearing elsewhere" rule).

    Scale shape: lines explode map-side; the df count is a groupBy on
    the 8-byte xxhash64 of the line (map-side combinable, so a banner
    in a billion docs collapses to per-partition partials — deliberately
    NOT a window, which would ship every copy of a hot line to one
    reducer). The verdict join touches only the OVER-FREQUENT hash set
    (true boilerplate is few distinct lines, however many copies), so
    the unique-line majority never re-joins its own stats — an anti /
    left join against a set AQE will usually broadcast; reconstruction
    shuffles (doc_id, pos, line) once. Nothing driver-side.
    """
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"unknown mode {mode!r}")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias(
            "pos", "line"
        ),
    ).withColumn("_h", F.xxhash64("line"))
    bad = (
        lines.groupBy("_h")
        .agg(
            F.count("*").alias("_df"),
            F.min(F.struct(id_col, "pos")).alias("_first"),
        )
        .where(F.col("_df") > max_line_df)
    )
    if mode == "drop_all":
        kept = lines.join(bad.select("_h"), "_h", "left_anti")
    else:
        kept = lines.join(bad.select("_h", "_first"), "_h", "left").where(
            F.col("_first").isNull()
            | (
                (F.col("_first")[id_col] == F.col(id_col))
                & (F.col("_first")["pos"] == F.col("pos"))
            )
        )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                delim,
            ).alias(text_col)
        )
    )


def sql_sample_predicate_duckdb(
    rates: dict[str, float] | float,
    strata_col: str | None = None,
    default_rate: float = 0.0,
    salt: str = "sample",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB WHERE predicate computing the SAME keep decision as
    :func:`stratified_sample` (murmur3 replay via functions.hashes)."""
    from ..functions.hashes import sql_murmur3_u32_duckdb

    h1 = sql_murmur3_u32_duckdb(f"({id_expr})::varchar")
    h = sql_murmur3_u32_duckdb(f"'{salt}'", seed=h1)
    bucket = f"(({h}) % {SPLIT_BUCKETS})"
    if isinstance(rates, dict):
        if strata_col is None:
            raise ValueError("per-stratum rates need strata_col")
        case = "CASE"
        for val, r in sorted(rates.items()):
            case += (
                f" WHEN {strata_col} = '{val}'"
                f" THEN {int(round(float(r) * SPLIT_BUCKETS))}"
            )
        case += f" ELSE {int(round(float(default_rate) * SPLIT_BUCKETS))} END"
        thr = case
    else:
        thr = str(int(round(float(rates) * SPLIT_BUCKETS)))
    return f"{bucket} < ({thr})"


def sql_split_duckdb(
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: str = "split",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB CASE expression computing the SAME ``split`` assignment
    as :func:`split_corpus` (murmur3 replay via ``functions.hashes``)."""
    from ..functions.hashes import sql_murmur3_u32_duckdb

    h1 = sql_murmur3_u32_duckdb(f"({id_expr})::varchar")
    h = sql_murmur3_u32_duckdb(f"'{salt}'", seed=h1)
    bucket = f"(({h}) % {SPLIT_BUCKETS})"
    acc = 0.0
    cuts: list[tuple[str, int]] = []
    for name, w in splits:
        acc += w
        cuts.append((name, int(round(acc * SPLIT_BUCKETS))))
    cuts[-1] = (cuts[-1][0], SPLIT_BUCKETS)
    case = "CASE"
    for name, hi in cuts[:-1]:
        case += f" WHEN {bucket} < {hi} THEN '{name}'"
    case += f" ELSE '{cuts[-1][0]}' END"
    return case


def token_budget_cut(
    docs: DataFrame,
    budget_tokens: int,
    salt: str = "budget",
    text_col: str = "text",
    id_col: str = "doc_id",
    order_buckets: int = 256,
) -> DataFrame:
    """Cut a corpus to a token budget, deterministically: docs are
    ordered by ``(murmur3(id:salt), id)`` — an unbiased reproducible
    shuffle, the same determinism contract as :func:`split_corpus` —
    and the MAXIMAL PREFIX whose running token total fits
    ``budget_tokens`` survives (once a doc overflows, it and
    everything after it is cut: pure prefix semantics, so the kept
    set of a smaller budget is a subset of a larger one's, and the
    cut is stable across reruns, partitionings, engines, and corpus
    append order). The "give me exactly a 1T-token mix" op between
    :func:`mix_corpus` and packing.

    Scale shape: the exclusive running sum never serializes — the
    hash's top bits split the order into ``order_buckets`` ranges
    (the bucket is a PREFIX of the sort key), per-bucket totals fold
    into offsets over a ≤ ``order_buckets``-row frame, and the
    per-doc window runs per bucket (the ``pack_spans`` /
    ``cap_per_domain`` two-phase pattern). Output keeps every input
    column plus ``n_tokens``.
    """
    from ..functions.hashes import murmur3_u32
    from .text_analysis import token_count

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    b = int(order_buckets)
    if b < 2 or (b & (b - 1)) != 0 or b > 1 << 20:
        raise ValueError("order_buckets must be a power of two in [2, 2^20]")
    shift = 32 - b.bit_length() + 1
    base = docs.withColumns(
        {
            "_h": murmur3_u32(F.col(id_col).cast("string"), salt=salt),
            "n_tokens": token_count(F.col(text_col)).cast("long"),
        }
    ).withColumn("_b", F.shiftrightunsigned(F.col("_h"), shift))
    woff = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        base.groupBy("_b")
        .agg(F.sum("n_tokens").alias("_bt"))
        .select(
            "_b",
            F.coalesce(F.sum("_bt").over(woff), F.lit(0))
            .cast("long")
            .alias("_off"),
        )
    )
    wloc = (
        Window.partitionBy("_b")
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offs), "_b")
        .withColumn(
            "_g",
            (
                F.coalesce(F.sum("n_tokens").over(wloc), F.lit(0))
                + F.col("_off")
            ).cast("long"),
        )
        .where(F.col("_g") + F.col("n_tokens") <= budget_tokens)
        .drop("_h", "_b", "_off", "_g")
    )


def temperature_weights(
    docs: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    total_epochs: float = 1.0,
) -> dict[str, float]:
    """Temperature-based mixing weights (the multilingual-LM recipe:
    sample stratum i with probability ∝ n_i^alpha — alpha=1 is
    proportional/no-op, alpha→0 approaches uniform across strata):
    returns per-stratum epoch weights for :func:`mix_corpus`, scaled
    so the EXPECTED total row count equals ``total_epochs`` × the
    corpus size. One count aggregate (stratum-cardinality rows to the
    driver); the returned dict feeds the existing deterministic mixer,
    so the sampled mix inherits its reproducibility and nesting."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {
        r[strata_col]: r["n"]
        for r in docs.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(counts.values())
    if not n_total:
        return {}
    powered = {s: float(n) ** float(alpha) for s, n in counts.items()}
    z = sum(powered.values())
    # target rows for stratum i: total_epochs * n_total * p_i, so the
    # per-doc epoch weight is that divided by the stratum's own count
    return {
        s: round(
            float(total_epochs) * n_total * (powered[s] / z) / counts[s], 6
        )
        for s in counts
    }
