"""Learning-to-rank (the ES LTR-plugin shape): feature extraction over
search results, a small pointwise model, feature-weighted reranking.

Division of labor is the one every production LTR deployment uses:

* **feature extraction is distributed** — one row per (query, doc)
  with the lexical score (the full scored match set, no top-k cut),
  optional vector cosine, and any metadata columns, built from the
  same exact engines every other operator uses;
* **training is driver-side NumPy** — the labeled set is qrels-sized
  (thousands of rows, human-annotated), orders of magnitude below
  Spark's break-even, and a full-batch logistic fit on float64 with
  zero init is deterministic given a deterministic row order (we sort
  by (query_id, doc_id) before stacking);
* **scoring/reranking is distributed again** — the learned weights
  fold into ONE Column expression over the feature frame, so
  reranking 100 TB of candidates is a map-only pass.

Features are standardized inside ``train_ltr`` (per-feature mean/std
from the TRAINING rows, returned with the model) — raw BM25 scores and
char counts live on wildly different scales, and an unstandardized
full-batch fit needs per-feature learning rates to converge. The
returned model carries (weights, bias, means, stds, feature order), so
``ltr_score_col`` reproduces the exact training-time transform.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ltr_features(
    index,
    queries: dict[str, str],
    documents: DataFrame | None = None,
    doc_feature_cols: tuple[str, ...] = (),
    synonyms: dict[str, str] | None = None,
) -> DataFrame:
    """(query_id, doc_id, bm25, n_query_terms, <doc_feature_cols...>)
    for EVERY matching doc of every query — the full scored match set
    (:func:`~.query_exec.scored_docs`), because training needs
    negatives below the current top-k. The per-query loop builds one
    union plan (queries are a labeled handful; the 100 TB side is the
    docs, which stay distributed)."""
    from .query_exec import parse_query, scored_docs

    parts = []
    for qid, text in queries.items():
        n_terms = len(parse_query(text, synonyms, index.token_fn()))
        part = scored_docs(index, text, synonyms=synonyms).select(
            F.lit(str(qid)).alias("query_id"),
            "doc_id",
            F.col("score").alias("bm25"),
            F.lit(n_terms).alias("n_query_terms"),
        )
        parts.append(part)
    if not parts:
        raise ValueError("queries must be non-empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if doc_feature_cols:
        if documents is None:
            raise ValueError("doc_feature_cols needs documents=")
        missing = [c for c in doc_feature_cols if c not in documents.columns]
        if missing:
            raise ValueError(f"documents= lacks feature columns {missing}")
        out = out.join(
            documents.select("doc_id", *doc_feature_cols), "doc_id"
        )
    return out


def train_ltr(
    features: DataFrame,
    qrels: DataFrame,
    feature_cols: tuple[str, ...],
    lr: float = 0.5,
    n_iters: int = 200,
    l2: float = 1e-3,
) -> dict:
    """Pointwise logistic fit: label = 1 iff (query_id, doc_id) has
    ``rel > 0`` in qrels; every other FEATURE row is a negative (the
    engine retrieved it, the annotator didn't mark it). Deterministic:
    rows sorted by (query_id, doc_id), zero init, full-batch float64
    GD with L2 on the weights (not the bias). Returns the model dict
    consumed by :func:`ltr_score_col`."""
    rows = (
        features.join(
            qrels.where(F.col("rel") > 0).select(
                "query_id", "doc_id", F.lit(1.0).alias("label")
            ),
            ["query_id", "doc_id"],
            "left",
        )
        .fillna({"label": 0.0})
        .orderBy("query_id", "doc_id")
        .select(*feature_cols, "label")
        .collect()
    )
    if not rows:
        raise ValueError("no training rows (empty features frame?)")
    x = np.array([[float(r[c]) for c in feature_cols] for r in rows])
    y = np.array([float(r["label"]) for r in rows])
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd[sd == 0.0] = 1.0
    xs = (x - mu) / sd
    w = np.zeros(len(feature_cols))
    b = 0.0
    n = len(y)
    for _ in range(int(n_iters)):
        p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
        g = xs.T @ (p - y) / n + float(l2) * w
        gb = float((p - y).mean())
        w -= float(lr) * g
        b -= float(lr) * gb
    return {
        "feature_cols": list(feature_cols),
        "weights": w.tolist(),
        "bias": float(b),
        "means": mu.tolist(),
        "stds": sd.tolist(),
    }


def ltr_score_col(model: dict) -> F.Column:
    """The learned scorer as ONE Column expression (map-only at any
    scale): sigmoid(w · standardized(x) + b)."""
    z = F.lit(float(model["bias"]))
    for c, w, m, s in zip(
        model["feature_cols"], model["weights"], model["means"],
        model["stds"],
    ):
        z = z + F.lit(float(w)) * (
            (F.col(c).cast("double") - F.lit(float(m))) / F.lit(float(s))
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def ltr_rerank(
    features: DataFrame, model: dict, k: int = 10
) -> DataFrame:
    """(query_id, doc_id, ltr_score, rank): per-query top-k by the
    learned scorer (ties to lowest doc_id) — a Window top-k over the
    feature frame, the standard rerank shape."""
    from pyspark.sql import Window

    scored = features.select(
        "query_id", "doc_id", ltr_score_col(model).alias("ltr_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ltr_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
    )
