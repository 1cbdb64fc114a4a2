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

from pyspark.sql import DataFrame
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
