"""Result diversification: Maximal Marginal Relevance (Carbonell &
Goldstein, SIGIR 1998) over the top-k page.

``MMR = argmax_d [ λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) ]`` — greedily
pick the next result that is relevant AND far from everything already
picked. The classic fix for a results page of near-duplicates (which a
web corpus guarantees: syndicated articles, mirrored pages).

Scale shape: diversification operates on the RESULT PAGE, not the
corpus — the candidate set is the over-fetched top-``window`` (tens to
hundreds of rows), so the greedy loop is driver-side NumPy on a k-row
matrix, exactly like the federated k-row merges and the pinned-query
frame. The expensive parts (retrieval, embedding fetch) stay
distributed: one broadcast semi-join pulls the window's vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_rerank(
    topk: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, score) candidates + their embeddings → k MMR-ordered
    rows (doc_id, score, mmr, rank).

    Relevance is min-max-normalized over the candidate window (MMR
    mixes relevance with cosine similarity, so both must live on
    [0, 1]); similarity is cosine between candidate embeddings. A
    candidate with no embedding row is kept with similarity 0 to
    everything (it cannot be redundant with what it can't be compared
    to) — deterministic, and ties break on lowest doc_id. ``lam=1``
    degrades to the input ranking (a pytest pin)."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cand = topk.select("doc_id", "score").collect()  # the k-row page
    if not cand:
        return topk.sparkSession.createDataFrame(
            [], "doc_id long, score double, mmr double, rank int"
        )
    ids = [int(r["doc_id"]) for r in cand]
    rel = np.array([float(r["score"]) for r in cand])
    lo, hi = rel.min(), rel.max()
    rel_n = (rel - lo) / (hi - lo) if hi > lo else np.ones_like(rel)

    id_set = topk.sparkSession.createDataFrame(
        [(i,) for i in ids], f"{id_col} long"
    )
    vec_rows = {
        int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64)
        for r in embeddings.join(
            F.broadcast(id_set), id_col, "left_semi"
        ).collect()
    }
    n = len(ids)
    vecs = np.zeros((n, len(next(iter(vec_rows.values()))) if vec_rows else 1))
    have = np.zeros(n, dtype=bool)
    for i, d in enumerate(ids):
        v = vec_rows.get(d)
        if v is not None:
            nv = np.linalg.norm(v)
            if nv > 0:
                vecs[i] = v / nv
                have[i] = True
    sim = vecs @ vecs.T  # cosine for normalized rows; 0 where missing

    picked: list[int] = []
    mmr_vals: list[float] = []
    remaining = list(range(n))
    while remaining and len(picked) < int(k):
        best_i, best_key = None, None
        for i in remaining:
            red = max((sim[i, j] for j in picked), default=0.0) if have[i] else 0.0
            v = lam * rel_n[i] - (1.0 - lam) * red
            key = (round(v, 9), -ids[i])  # ties to lowest doc_id
            if best_key is None or key > best_key:
                best_i, best_key = i, key
        best_v = lam * rel_n[best_i] - (1.0 - lam) * (
            max((sim[best_i, j] for j in picked), default=0.0)
            if have[best_i] else 0.0
        )
        picked.append(best_i)
        mmr_vals.append(float(best_v))
        remaining.remove(best_i)

    rows = [
        (ids[i], float(rel[i]), round(m, 6), r + 1)
        for r, (i, m) in enumerate(zip(picked, mmr_vals))
    ]
    return topk.sparkSession.createDataFrame(
        rows, "doc_id long, score double, mmr double, rank int"
    )
