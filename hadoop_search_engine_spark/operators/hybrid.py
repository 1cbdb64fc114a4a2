"""Hybrid search: lexical BM25 + vector cosine, fused by Reciprocal
Rank Fusion (RRF, Cormack et al. 2009).

The reference engine is lexical-only (its serving map is a flat
term -> [url] dict, server/src/services/search.service.js:12-16); a
modern retrieval stack over the same corpus pairs that lexical branch
with an embedding ANN branch and fuses the two rankings. RRF is the
standard fusion because it needs no score calibration: each branch
contributes ``w / (rrf_k + rank)`` and documents found by both
branches accumulate.

Scale shape: the EXPENSIVE work is the two branch searches, and both
are the already-scale-proven paths (``search_topk``'s block-index
scorer; ``cosine_topk`` / ``lsh_bucket_topk``'s pruned scans). Fusion
itself only ever touches ``k_lex + k_vec`` rows — a bounded union +
groupBy that AQE collapses to a single tiny stage, so the single-
partition ranking windows here are windows over <= a few hundred rows
by construction, never over a corpus.

Determinism contract (what the DuckDB oracle replays): each branch is
ranked by its ROUNDED score (BM25 at 4 dp, cosine at 6 dp — the same
precision the board compares those branches at) with ascending-id
tie-break, so rank assignment is bit-identical across engines; the
RRF sum over identical integer ranks is then exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K_DEFAULT = 60


def rank_branch(
    branch: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    k: int | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """(id, rank) from a branch's (id, score) result: rank 1 = best,
    ordered by rounded score desc then id asc. The input is a top-k
    result (bounded rows), so the single-partition window is safe."""
    w = Window.orderBy(
        F.round(F.col(score_col), ndigits).desc(), F.col(id_col).asc()
    )
    ranked = branch.select(
        F.col(id_col).alias("doc_id"),
        F.row_number().over(w).alias("rank"),
    )
    return ranked.where(F.col("rank") <= k) if k is not None else ranked


def rrf_fuse(
    branches: list[DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K_DEFAULT,
    weights: list[float] | None = None,
    names: list[str] | None = None,
) -> DataFrame:
    """Fuse ranked branches (each ``(doc_id, rank)``) into a top-k by
    ``sum_i w_i / (rrf_k + rank_i)``, ties by doc_id ascending.

    Returns ``(doc_id, rrf, <name>_rank ...)`` — one nullable rank
    column per named branch so callers can see which branch surfaced
    each hit."""
    if not branches:
        raise ValueError("need at least one ranked branch")
    if weights is None:
        weights = [1.0] * len(branches)
    if names is None:
        names = [f"b{i}" for i in range(len(branches))]
    if not (len(branches) == len(weights) == len(names)):
        raise ValueError("branches, weights, names must align")
    tagged = None
    for br, w, name in zip(branches, weights, names):
        t = br.select(
            "doc_id",
            F.col("rank"),
            F.lit(float(w)).alias("w"),
            F.lit(name).alias("branch"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    aggs = [
        F.round(
            F.sum(F.col("w") / (F.lit(float(rrf_k)) + F.col("rank"))), 6
        ).alias("rrf")
    ]
    for name in names:
        aggs.append(
            F.max(
                F.when(F.col("branch") == name, F.col("rank"))
            ).alias(f"{name}_rank")
        )
    fused = tagged.groupBy("doc_id").agg(*aggs)
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(k)


def hybrid_topk(
    index,
    query_text: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    k_lex: int = 50,
    k_vec: int = 50,
    rrf_k: int = RRF_K_DEFAULT,
    w_lex: float = 1.0,
    w_vec: float = 1.0,
    serving: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BM25 top-``k_lex`` (block index, :func:`~.query_exec.search_topk`)
    fused with exact-cosine top-``k_vec`` (:func:`~.similarity.cosine_topk`)
    by weighted RRF. ``embeddings``' ``id_col`` is the document id the
    vectors are keyed by.

    Swap the vector branch for :func:`~.similarity.lsh_bucket_topk` /
    ``ivf_topk`` output at scale — any ``(id, cosine)`` frame fuses the
    same way via :func:`rank_branch` + :func:`rrf_fuse`."""
    from .query_exec import search_topk
    from .similarity import cosine_topk

    lex = search_topk(index, query_text, k=k_lex, serving=serving)
    vec = cosine_topk(
        embeddings, query_vec, k=k_vec, id_col=id_col, vec_col=vec_col
    )
    return rrf_fuse(
        [
            rank_branch(lex, "score", "doc_id", ndigits=4),
            rank_branch(vec, "cosine", id_col, ndigits=6),
        ],
        k=k,
        rrf_k=rrf_k,
        weights=[w_lex, w_vec],
        names=["lex", "vec"],
    )


def rescore_topk(
    index,
    query_text: str,
    embeddings: DataFrame,
    query_vec: list[float],
    window: int = 100,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
    serving: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES ``rescore``: two-phase ranking. Phase 1 retrieves the BM25
    top-``window`` from the block index (cheap, recall-oriented);
    phase 2 re-scores ONLY that window with an expensive secondary
    signal — here cosine to ``query_vec``, the bi-encoder-rerank shape
    — and re-ranks by the combined score:

      * ``"total"``    — qw * bm25 + rw * cosine  (ES default)
      * ``"multiply"`` — bm25 * cosine
      * ``"replace"``  — rw * cosine (rerank purely by phase 2)

    Window docs with no embedding keep a secondary of 0 (never
    dropped). Returns ``(doc_id, score, bm25, secondary)``.

    Scale shape: phase 2's cost is bounded by ``window``, never the
    corpus — the embedding table is pruned to the window ids by a
    broadcast semi-join running beside its scan (window ids are k-row),
    and the surviving <= window vectors broadcast back onto the phase-1
    frame. Determinism contract: bm25 rounded at 4 dp, cosine at 6 dp
    before combining (the precisions the board compares those branches
    at), so the DuckDB oracle's combined score is bit-identical.
    """
    from .query_exec import search_topk
    from .similarity import cosine_sim

    if score_mode not in ("total", "multiply", "replace"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    win = search_topk(index, query_text, k=window, serving=serving)
    emb = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # prune the embedding scan to the window ids (broadcast semi),
    # then broadcast the <= window surviving vectors onto the window
    pruned = emb.join(
        F.broadcast(win.select("doc_id")), "doc_id", "left_semi"
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    j = win.join(F.broadcast(pruned), "doc_id", "left")
    bm = F.round(F.col("score"), 4)
    cos = F.when(
        F.col("_v").isNotNull(), F.round(cosine_sim(F.col("_v"), q), 6)
    ).otherwise(F.lit(0.0))
    if score_mode == "total":
        combined = (
            F.lit(float(query_weight)) * bm
            + F.lit(float(rescore_weight)) * cos
        )
    elif score_mode == "multiply":
        combined = bm * cos
    else:
        combined = F.lit(float(rescore_weight)) * cos
    out = j.select(
        "doc_id",
        F.round(combined, 6).alias("score"),
        bm.alias("bm25"),
        cos.alias("secondary"),
    )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def function_score(
    index,
    query_text: str,
    docs: DataFrame,
    k: int = 10,
    decay: dict | None = None,
    field_value_factor: dict | None = None,
    random_score: dict | None = None,
    boost_mode: str = "multiply",
    mode: str = "or",
    synonyms: dict[str, str] | None = None,
    similarity=None,
) -> DataFrame:
    """ES ``function_score``: re-weight relevance by a document-level
    signal — freshness decay, popularity, length priors — the query
    itself can't express. Exactly ES's semantics:

      * ``decay``: ``{"kind": "gauss"|"exp"|"linear", "field": col,
        "origin": o, "scale": s, "offset": 0.0, "decay": 0.5}`` —
        the factor is 1 at ``origin`` (± ``offset``) and reaches
        ``decay`` at distance ``scale``:
          gauss:  exp(-d² / (2σ²)),  σ² = -scale²/(2 ln decay)
          exp:    exp(d · ln(decay)/scale)
          linear: max(0, (S - d)/S),  S = scale/(1 - decay)
        with d = max(0, |field - origin| - offset).
      * ``field_value_factor``: ``{"field": col, "factor": f,
        "modifier": "none"|"log1p"|"sqrt", "missing": m}`` —
        modifier(field * factor), ES field_value_factor.
      * ``random_score``: ``{"seed": n, "field": col}`` — ES's
        reproducible pseudo-random factor in [0, 1): here a salted
        murmur3 of the field value over 2^32 (pure function of
        (value, seed) — stable across reruns, partitionings, and
        engines, and replayed bit-exactly in the DuckDB oracle; field
        defaults to doc_id). The deterministic-jitter / sampling-boost
        function.
      * several given: the factors multiply (ES score_mode=multiply).
      * ``boost_mode``: ``multiply`` (default) | ``sum`` | ``replace``
        — how the factor combines with the relevance score.

    Returns ``(doc_id, score, relevance, factor)``.

    Scale shape: the relevance side is :func:`~.query_exec
    .scored_docs` — the FULL scored match set (cost ∝ query df; a
    boost can promote any matched doc, so a top-k window would be
    inexact — that cheaper trade IS :func:`rescore_topk`). The factor
    side prunes ``docs`` to (doc_id, field) columns before a join on
    the matched set — a column-pruned shuffle join sized by the match
    set, never a corpus-wide product. Determinism contract: relevance
    rounded at 4 dp, factor at 6 dp before combining (the board's
    branch precisions), so the DuckDB oracle is bit-identical.
    """
    import math

    from .query_exec import scored_docs

    if boost_mode not in ("multiply", "sum", "replace"):
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    if decay is None and field_value_factor is None and random_score is None:
        raise ValueError(
            "need decay, field_value_factor, and/or random_score"
        )

    matched = scored_docs(index, query_text, synonyms=synonyms, mode=mode,
                           similarity=similarity)
    factor = F.lit(1.0)
    cols = set()
    if decay is not None:
        kind = decay.get("kind", "gauss")
        if kind not in ("gauss", "exp", "linear"):
            raise ValueError(f"unknown decay kind {kind!r}")
        o = float(decay["origin"])
        s = float(decay["scale"])
        off = float(decay.get("offset", 0.0))
        dec = float(decay.get("decay", 0.5))
        if not (s > 0 and 0 < dec < 1):
            raise ValueError("need scale > 0 and 0 < decay < 1")
        fld = F.col(decay["field"]).cast("double")
        d = F.greatest(F.abs(fld - o) - off, F.lit(0.0))
        if kind == "gauss":
            two_sigma_sq = -(s * s) / math.log(dec)
            dfac = F.exp(-(d * d) / two_sigma_sq)
        elif kind == "exp":
            dfac = F.exp(d * (math.log(dec) / s))
        else:
            big_s = s / (1.0 - dec)
            dfac = F.greatest((big_s - d) / big_s, F.lit(0.0))
        # ES: a doc missing the decay field gets factor 1
        factor = factor * F.coalesce(dfac, F.lit(1.0))
        cols.add(decay["field"])
    if field_value_factor is not None:
        fvf = field_value_factor
        raw = F.col(fvf["field"]).cast("double") * float(fvf.get("factor", 1.0))
        modifier = fvf.get("modifier", "none")
        if modifier == "log1p":
            raw = F.log1p(raw)
        elif modifier == "sqrt":
            raw = F.sqrt(raw)
        elif modifier != "none":
            raise ValueError(f"unknown modifier {modifier!r}")
        missing = float(fvf.get("missing", 1.0))
        factor = factor * F.coalesce(raw, F.lit(missing))
        cols.add(fvf["field"])

    if random_score is not None:
        from ..functions.hashes import murmur3_u32

        seed = int(random_score.get("seed", 0))
        fld = random_score.get("field", "doc_id")
        rnd = murmur3_u32(
            F.col(fld).cast("string"), salt=f"rs:{seed}"
        ) / F.lit(float(1 << 32))
        factor = factor * rnd
        if fld != "doc_id":
            cols.add(fld)

    meta = docs.select(F.col("doc_id"), *[F.col(c) for c in sorted(cols)])
    j = matched.join(meta, "doc_id", "left")
    rel = F.round(F.col("score"), 4)
    fac = F.round(factor, 6)
    if boost_mode == "multiply":
        combined = rel * fac
    elif boost_mode == "sum":
        combined = rel + fac
    else:
        combined = fac
    out = j.select(
        "doc_id",
        F.round(combined, 6).alias("score"),
        rel.alias("relevance"),
        fac.alias("factor"),
    )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def mmr_rerank(
    index,
    query_text: str,
    embeddings: DataFrame,
    k: int = 10,
    window: int = 50,
    lam: float = 0.7,
    serving: str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998): greedily re-rank the BM25 top-``window`` so each
    pick balances relevance against redundancy with what is already
    picked,

        mmr(d) = lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)

    with ``rel`` the window-max-normalized BM25 and ``S`` the selected
    set (the first pick is the plain BM25 winner). Near-duplicate hits
    that survive collapse/dedup stop crowding the first page. Returns
    ``(doc_id, mmr_rank, mmr_score, bm25)``, ``mmr_rank`` 1-based in
    selection order.

    Scale shape: phase 1 is the proven block-index scorer; the greedy
    loop is inherently sequential in k, so it runs driver-side over
    the BOUNDED window — <= ``window`` rows and one window x selected
    cosine matrix (both tiny by construction; the embedding scan is
    pruned to the window ids before collection). Determinism contract
    (the DuckDB oracle replays every step): bm25 at 4 dp, rel and each
    pairwise cosine at 6 dp, the combined score at 6 dp, ties by
    ascending doc_id; docs with no embedding have cosine 0 to
    everything (maximally "diverse", never dropped).
    """
    from .query_exec import search_topk

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    win = search_topk(index, query_text, k=window, serving=serving)
    emb = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    pruned = emb.join(
        F.broadcast(win.select("doc_id")), "doc_id", "left_semi"
    )
    rows = (
        win.join(F.broadcast(pruned), "doc_id", "left")
        .select("doc_id", F.round("score", 4).alias("bm25"), "_v")
        .collect()
    )
    spark = embeddings.sparkSession
    schema = "doc_id long, mmr_rank int, mmr_score double, bm25 double"
    if not rows:
        return spark.createDataFrame([], schema)

    import numpy as np

    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    bm = np.array([r["bm25"] for r in rows], dtype=np.float64)
    dim = next((len(r["_v"]) for r in rows if r["_v"] is not None), 0)
    V = np.zeros((len(rows), max(dim, 1)), dtype=np.float64)
    has_v = np.zeros(len(rows), dtype=bool)
    for i, r in enumerate(rows):
        if r["_v"] is not None:
            V[i] = r["_v"]
            has_v[i] = True

    def _seq_dot(a: np.ndarray, b: np.ndarray) -> float:
        # LEFT-TO-RIGHT float64 accumulation, matching DuckDB's
        # list_dot_product exactly. BLAS (V @ x) sums in SIMD/pairwise
        # order, which lands on a different last ulp — at sf0.1 a
        # cosine right at a 6-dp rounding boundary then rounds apart
        # across engines (round-4 board catch: 0.667768 vs 0.667769).
        # The window is <= `window` rows of small dim, so the scalar
        # loop costs microseconds and buys bit-identical doubles.
        s = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            s += x * y
        return s

    norm = np.array([math.sqrt(_seq_dot(v, v)) for v in V])
    norm[norm == 0] = 1.0
    from ..functions.quantize import round_half_away

    # half-AWAY rounding (functions/quantize.py): np.round's
    # half-even mode diverges from DuckDB/Spark round exactly at
    # half boundaries, which 0.7 * (6-dp rel) hits structurally
    rel = round_half_away(bm / bm.max(), 6)

    n = len(rows)
    picked: list[int] = []
    remaining = np.ones(n, dtype=bool)
    maxsim = np.zeros(n, dtype=np.float64)
    out = []
    for rank in range(1, min(k, n) + 1):
        # the redundancy weight is the 12-dp-quantized complement:
        # float64 (1.0 - 0.7) is 0.30000000000000004, while a replay
        # engine writing the literal 0.3 parses the NEAREST double to
        # 0.3 — a different multiplier whose products split 6-dp
        # rounding boundaries at scale (round-4 sf0.1 board catch).
        # round(·, 12) lands both on the same double for any
        # 12-dp-expressible lam.
        lam_c = round(1.0 - lam, 12)
        score = round_half_away(lam * rel - lam_c * maxsim, 6)
        score[~remaining] = -np.inf
        best = np.flatnonzero(score == np.max(score))  # ties: low id
        i = best[np.argmin(ids[best])]
        out.append((int(ids[i]), rank, float(score[i]), float(bm[i])))
        remaining[i] = False
        picked.append(i)
        if has_v[i]:
            dots = np.array([_seq_dot(V[j], V[i]) for j in range(n)])
            sims = round_half_away(dots / (norm * norm[i]), 6)
            sims[~has_v] = 0.0
            maxsim = np.maximum(maxsim, sims)
    return spark.createDataFrame(out, schema)


def rank_feature_topk(
    index,
    query_text: str,
    docs: DataFrame,
    field: str,
    fn: str = "saturation",
    pivot: float | None = None,
    scaling: float = 1.0,
    exponent: float = 1.0,
    boost: float = 1.0,
    k: int = 10,
    mode: str = "or",
    synonyms: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``rank_feature`` fusion: relevance plus an ADDITIVE
    monotone-saturating function of a static numeric feature
    (pagerank, popularity, freshness score) —

      saturation: S = f / (f + pivot)        (pivot REQUIRED here: ES
                  defaults it to an approximate geometric mean, which
                  is sketch-derived and nondeterministic; an explicit
                  pivot keeps the score a pure function of the data)
      log:        S = ln(scaling + f)
      sigmoid:    S = f^exp / (f^exp + pivot^exp)

    ``score = round(bm25, 4) + boost · round(S, 6)`` — the branch
    precisions of the board's determinism contract, so the DuckDB
    oracle replays bit-identically. Missing/negative features
    contribute 0 (ES: rank_feature fields are positive; docs without
    the feature get no boost — NOT excluded).

    Scale shape: the relevance side is the FULL scored match set (an
    additive boost can promote any matched doc, so a top-k window
    would be inexact — that trade is :func:`rescore_topk`); the
    feature side is a column-pruned (doc_id, field) join on the match
    set. One shuffle sized by the match set, top-k at the end."""
    from .query_exec import scored_docs

    if fn not in ("saturation", "log", "sigmoid"):
        raise ValueError(f"fn must be saturation|log|sigmoid, got {fn!r}")
    if fn in ("saturation", "sigmoid"):
        if pivot is None or not pivot > 0:
            raise ValueError(f"{fn} needs an explicit pivot > 0")
    if fn == "sigmoid" and not exponent > 0:
        raise ValueError("sigmoid needs exponent > 0")
    if fn == "log" and not scaling > 0:
        raise ValueError("log needs scaling > 0")
    matched = scored_docs(index, query_text, synonyms=synonyms, mode=mode)
    x = F.col(field).cast("double")
    pos = F.when(x > 0, x)  # null and non-positive features -> no boost
    if fn == "saturation":
        s = pos / (pos + float(pivot))
    elif fn == "log":
        s = F.log(float(scaling) + pos)
    else:
        p = F.pow(pos, float(exponent))
        s = p / (p + float(pivot) ** float(exponent))
    meta = docs.select("doc_id", field)
    j = matched.join(meta, "doc_id", "left")
    rel = F.round(F.col("score"), 4)
    feat = F.coalesce(F.round(s, 6), F.lit(0.0))
    return (
        j.select(
            "doc_id",
            F.round(rel + float(boost) * feat, 6).alias("score"),
            rel.alias("relevance"),
            feat.alias("feature_score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
