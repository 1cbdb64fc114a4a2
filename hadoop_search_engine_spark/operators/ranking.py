"""Pluggable ranking similarities for the indexed serving path.

The reference engine has exactly one ranking (posting order —
/root/reference/server/src/services/search.service.js:58-90) and this
repo's default is BM25; real search engines (Lucene/Elasticsearch
``similarity`` modules) let each query pick its scoring model over the
SAME index. This module adds that surface without touching the index
format beyond one lexicon column (``ctf``, the collection term
frequency — already aggregated per term at build time as
``term_stats.tokens``; the lexicon projection simply exposes it).

Contract every similarity here satisfies, which is what makes ONE
function per term serve both scoring and block-max pruning:

  * a matched (term, doc) contributes ``f(tf, dl)`` with ``f``
    vectorized (NumPy float64), monotone non-decreasing in tf and
    non-increasing in dl;
  * therefore ``f(max_tf, min_dl)`` — the pair every posting block
    stores — upper-bounds the contribution of every doc in the block,
    and the WAND segment pruning stays EXACT for any similarity;
  * only matched terms contribute (Lucene doc-at-a-time semantics:
    no score mass for absent terms), so disjunctive/conjunctive
    matching, tombstones, doc_filter, pagination and top-k selection
    are all shared machinery.

Similarities (all exact float64 — no Lucene 8-bit norm quantization):

  * ``bm25`` (default, handled natively by the scorers):
    ``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.
  * ``lm_dirichlet`` (Lucene LMDirichletSimilarity): per matched term
    ``boost * max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl+mu)))`` with
    ``p = ctf / total_tokens`` the collection language model. Needs
    the lexicon ``ctf`` column (indexes built before it must be
    rebuilt or merged). Lucene's clamp-at-zero is kept: a matched doc
    stays in the result set even at score 0.
  * ``tfidf`` (Lucene ClassicSimilarity, exact arithmetic):
    ``boost * (1 + ln(N/(df+1)))^2 * sqrt(tf) / sqrt(dl)``.
  * ``boolean`` (ES boolean similarity): ``boost`` per matched term —
    the score is "how many query terms matched", boost-weighted.

dl is clamped to >= 1 inside the tf/dl-shaped formulas: a doc with a
posting always has dl >= 1, so the clamp only ever touches the
filtered-search eligibility page's zero entries (docs masked out
BEFORE top-k anyway) and keeps the vectorized math NaN/inf-free.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np

__all__ = [
    "BM25",
    "LMDirichlet",
    "ClassicTFIDF",
    "BooleanSim",
    "resolve_similarity",
    "build_term_fns",
]


# ---- per-term contribution kernels (module-level: picklable through
# functools.partial for the executor-shipped scorer closures) ----------


def _lm_dirichlet_contrib(
    tf: np.ndarray, dl: np.ndarray, w: float, mu: float, p: float
) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = np.maximum(np.asarray(dl, dtype=np.float64), 1.0)
    s = np.log1p(tf / (mu * p)) + (math.log(mu) - np.log(dl + mu))
    return w * np.maximum(s, 0.0)


def _tfidf_contrib(tf: np.ndarray, dl: np.ndarray, w: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = np.maximum(np.asarray(dl, dtype=np.float64), 1.0)
    return w * np.sqrt(tf) / np.sqrt(dl)


def _bool_contrib(tf: np.ndarray, dl: np.ndarray, w: float) -> np.ndarray:
    return np.full(np.shape(tf), w, dtype=np.float64)


# ---- similarity declarations -----------------------------------------


@dataclass(frozen=True)
class BM25:
    """The index's native ranking — resolve_similarity returns None for
    it so every scorer keeps its existing (idf-folded) fast path."""

    name = "bm25"


@dataclass(frozen=True)
class LMDirichlet:
    name = "lm_dirichlet"
    mu: float = 2000.0

    def __post_init__(self):
        if not (self.mu > 0):
            raise ValueError(f"mu must be > 0, got {self.mu}")


@dataclass(frozen=True)
class ClassicTFIDF:
    name = "tfidf"


@dataclass(frozen=True)
class BooleanSim:
    name = "boolean"


_BY_NAME = {
    "bm25": BM25,
    "lm_dirichlet": LMDirichlet,
    "tfidf": ClassicTFIDF,
    "classic": ClassicTFIDF,
    "boolean": BooleanSim,
}


def resolve_similarity(spec):
    """str | similarity | None -> similarity instance, or None when the
    spec means the native BM25 path (None / "bm25" / BM25())."""
    if spec is None:
        return None
    if isinstance(spec, str):
        cls = _BY_NAME.get(spec)
        if cls is None:
            raise ValueError(
                f"unknown similarity {spec!r}; one of {sorted(_BY_NAME)}"
            )
        spec = cls()
    if isinstance(spec, BM25):
        return None
    if not isinstance(spec, (LMDirichlet, ClassicTFIDF, BooleanSim)):
        raise ValueError(f"not a similarity: {spec!r}")
    return spec


def build_term_fns(
    sim,
    meta: dict[str, dict],
    boosts: dict[str, float],
    n_docs: int,
    total_tokens: int,
) -> dict[int, object]:
    """term_hash -> vectorized ``f(tf, dl) -> contribution`` for every
    query term. ``meta`` is the lexicon probe result (term -> {hash,
    df, ctf, ...}); boosts multiply the term's contribution (same
    semantics as the BM25 path's idf folding)."""
    fns: dict[int, object] = {}
    for term, m in meta.items():
        w = float(boosts.get(term, 1.0))
        if isinstance(sim, LMDirichlet):
            ctf = m.get("ctf")
            if ctf is None:
                raise ValueError(
                    "lm_dirichlet needs the lexicon 'ctf' column; this "
                    "index predates it — rebuild the index (or merge / "
                    "vacuum, which rewrite the lexicon) to add it"
                )
            p = float(ctf) / float(total_tokens)
            fns[int(m["hash"])] = partial(
                _lm_dirichlet_contrib, w=w, mu=float(sim.mu), p=p
            )
        elif isinstance(sim, ClassicTFIDF):
            idf_c = 1.0 + math.log(float(n_docs) / (float(m["df"]) + 1.0))
            fns[int(m["hash"])] = partial(
                _tfidf_contrib, w=w * idf_c * idf_c
            )
        elif isinstance(sim, BooleanSim):
            fns[int(m["hash"])] = partial(_bool_contrib, w=w)
        else:  # pragma: no cover - resolve_similarity guards
            raise ValueError(f"not a similarity: {sim!r}")
    return fns
