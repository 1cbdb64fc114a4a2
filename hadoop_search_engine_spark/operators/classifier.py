"""Learned text classifier — fastText-style logistic regression over
hashed n-gram features, trained with deterministic full-batch gradient
descent. The "model-based quality filter" stage of a web-scale
training-data pipeline (GPT-3's LR quality classifier over CommonCrawl,
CCNet's fastText language/quality gates): train on a small labeled set
(target corpus = 1, random crawl = 0), score the whole crawl, keep docs
above a probability threshold.

Model: ``p(y=1 | d) = sigmoid(w · x_d + b)`` where ``x_d`` is the doc's
hashed unigram+bigram PRESENCE vector (:func:`~.dsir.doc_features`
buckets, each clamped to 0/1) and the intercept rides as one extra
feature. Binary presence — not raw counts — is deliberate: with counts
the margin scales with document length, the sigmoid saturates, and
full-batch GD oscillates (measured: counts need 4x the iterations or a
5x-smaller lr to reach the accuracy binary hits at lr=0.5, iters=5);
with presence the margin is bounded by the active-feature count and the
update is well-conditioned at textbook learning rates.

**Determinism / cross-engine exactness** (the lm.py / graph.py / IVF
contract): weights live as int64 MICRO-units (``w = wq / 1e6``), so

* margins ``sum_f c_f * wq_f`` are exact int64 sums — order-free;
* per-doc residuals are quantized ``r = round((p - y) * 1e6)`` BEFORE
  the gradient sum, so gradients ``sum_d r_d * c_f`` are exact int64;
* the update ``wq -= round(lr * grad / n)`` is one rounded double op
  per feature, computed INSIDE the engine (Spark ``F.round`` and
  DuckDB ``round`` share away-from-zero tie behavior; Python's
  ``round`` does not and is never used).

Training is therefore bit-reproducible across reruns, partitionings,
and engines — the DuckDB oracle unrolls the same GD iterations as
CTEs, exactly like the IVF trainer unrolls Lloyd iterations.

Scale shape (train on ~10^5-10^6 labeled docs, score 100 TB): the
feature table is tokens-scale, built once and cached across
iterations; each iteration is one BROADCAST join (the weight table is
``<= n_features + 1`` rows) + two partial-aggregated int64 sums; per
iteration ``<= n_features`` rows of gradient traffic reach the driver
(the IVF "k x dim per iter" pattern). Scoring the crawl is map-only
explode + broadcast join + one per-doc sum — embarrassingly parallel,
nothing wider than (doc_id, margin) shuffles.

No reference analog (the reference ingests everything). Exists for the
LLM-training-pipeline mandate, downstream of heuristic curation
(text_analysis.quality_score) and beside the LM perplexity filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsir import LLQ_SCALE, N_FEATURES_DEFAULT, doc_features

WEIGHTS_SCHEMA = "feature BIGINT, wq BIGINT"


def _features_with_intercept(
    docs: DataFrame, n_features: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, feature, count) hashed PRESENCE bag (count is always
    1; see the module docstring for why binary beats raw counts) + the
    intercept pseudo-feature ``n_features`` with count 1 — which also
    guarantees every doc (token-less included) has >= one feature row."""
    feats = doc_features(docs, n_features, text_col, id_col).select(
        "doc_id", "feature", F.lit(1).cast("long").alias("count")
    )
    icpt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(int(n_features)).cast("long").alias("feature"),
        F.lit(1).cast("long").alias("count"),
    )
    return feats.unionByName(icpt)


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, mm): exact int64 margin in micro-units."""
    return (
        feats.join(F.broadcast(weights), "feature", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("count") * F.coalesce(F.col("wq"), F.lit(0))
            ).alias("mm")
        )
    )


def _prob(mm_micro) -> F.Column:
    return F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(mm_micro.cast("double") / F.lit(float(LLQ_SCALE))))
    )


def train_text_classifier(
    docs: DataFrame,
    label_col: str = "label",
    n_features: int = N_FEATURES_DEFAULT,
    iters: int = 5,
    lr: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-batch GD logistic regression; returns the weight table
    ``(feature, wq)`` (int64 micro-units; feature ``n_features`` is
    the intercept). ``label_col`` must be 0/1 (anything castable).
    ``lr`` should be exactly binary-representable (0.5, 0.25, ...) so
    the engine-side update literal is unambiguous.

    Each iteration runs two jobs (margins, gradients) over the cached
    feature table; ``<= n_features`` gradient rows reach the driver
    per iteration. Deterministic: same data + params -> bit-identical
    weights, any partitioning, either engine."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if lr <= 0:
        raise ValueError("lr must be > 0")
    spark = docs.sparkSession
    feats = _features_with_intercept(
        docs, n_features, text_col, id_col
    ).persist()
    labels = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("long").alias("y"),
    ).persist()
    n = labels.count()
    if n == 0:
        raise ValueError("empty training set")
    wq: dict[int, int] = {}
    try:
        for _ in range(iters):
            wdf = spark.createDataFrame(
                list(wq.items()) or [(int(n_features), 0)], WEIGHTS_SCHEMA
            )
            resid = (
                _margins(feats, wdf)
                .join(labels, "doc_id")
                .select(
                    "doc_id",
                    F.round((_prob(F.col("mm")) - F.col("y"))
                            * F.lit(LLQ_SCALE)).cast("long").alias("r"),
                )
            )
            # exact int64 gradient + the engine-side rounded update,
            # one row per touched feature to the driver
            deltas = (
                feats.join(resid, "doc_id")
                .groupBy("feature")
                .agg(F.sum(F.col("r") * F.col("count")).alias("g"))
                .select(
                    "feature",
                    F.round(
                        F.lit(float(lr)) * F.col("g").cast("double")
                        / F.lit(n).cast("double")
                    ).cast("long").alias("d"),
                )
                .collect()
            )
            for row in deltas:
                f, d = int(row["feature"]), int(row["d"])
                if d:
                    wq[f] = wq.get(f, 0) - d
    finally:
        feats.unpersist()
        labels.unpersist()
    # Zero weights are dropped: absent == 0 in every consumer, and it
    # makes the table canonical (a feature whose weight wandered back
    # to exactly 0 is indistinguishable from one never touched), which
    # the DuckDB oracle needs to reproduce the table row-for-row.
    nz = sorted((f, w) for f, w in wq.items() if w)
    return spark.createDataFrame(
        nz or [(int(n_features), 0)], WEIGHTS_SCHEMA
    )


def score_text_classifier(
    docs: DataFrame,
    weights: DataFrame,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, logit_micro, prob): exact int64 logit (micro-units)
    and the sigmoid probability (rounded to 6 dp for stable output).
    Map-only featurize + broadcast weight join + one per-doc sum."""
    feats = _features_with_intercept(docs, n_features, text_col, id_col)
    m = _margins(feats, weights.select("feature", "wq"))
    return m.select(
        "doc_id",
        F.col("mm").alias("logit_micro"),
        F.round(_prob(F.col("mm")), 6).alias("prob"),
    )


def classifier_filter(
    docs: DataFrame,
    weights: DataFrame,
    min_prob: float = 0.5,
    n_features: int = N_FEATURES_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep docs the classifier scores ``prob >= min_prob`` — the
    GPT-3-style learned quality gate. Returns the input columns."""
    scored = score_text_classifier(
        docs, weights, n_features, text_col, id_col
    ).where(F.col("prob") >= F.lit(float(min_prob)))
    return docs.join(
        scored.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )
