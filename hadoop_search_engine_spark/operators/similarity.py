"""Similarity search over embedding columns (array<float>).

The reference has no vector search; this is the training-data-pipeline
extension: approximate nearest neighbors over an ``embedding`` column.

  * :func:`cosine_topk` — brute-force exact top-k by cosine, entirely
    in built-in expressions (``aggregate``/``zip_with`` dot products,
    JVM codegen). The correctness baseline. One scan, one top-k sort
    of k rows per partition (TakeOrderedAndProject), no shuffle of the
    corpus.
  * :func:`lsh_bucket_topk` — random-hyperplane (sign) LSH: vectors
    are bucketed by the sign pattern of h deterministic hyperplanes;
    the query probes its own bucket plus all buckets at Hamming
    distance <= n_probe_bits. At scale this prunes the scan to
    buckets/2^h of the corpus (partition pruning if the table is
    written partitioned by bucket); recall is tested against the
    brute-force baseline.
  * :func:`cosine_dup_pairs` — embedding near-dup pairs above a
    cosine threshold, LSH-bucketed self-join (dedup use case).

Hyperplanes are splitmix64-derived — deterministic, no RNG state.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine with zero-vector guard: a zero norm yields 0.0 instead
    of an ANSI DIVIDE_BY_ZERO (the un-taken CASE branch still
    evaluates under codegen, so the divisor itself is floored)."""
    den = _norm(a) * _norm(b)
    return F.when(
        den > 0, _dot(a, b) / F.greatest(den, F.lit(1e-300))
    ).otherwise(F.lit(0.0))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes from splitmix64 bits."""
    from ..corpus import _splitmix64

    ids = np.arange(dim * n_planes, dtype=np.uint64)
    u1 = _splitmix64(ids).astype(np.float64) * np.float64(2.0**-64)
    u2 = _splitmix64(ids ^ np.uint64(0x5DEECE66D)).astype(np.float64) * np.float64(2.0**-64)
    u1 = np.clip(u1, 1e-12, 1.0)
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)  # Box-Muller
    return g.reshape(n_planes, dim)


def _lsh_bucket_udf(planes: np.ndarray):
    """Arrow-vectorized sign-pattern bucketing: one (batch × dim) @
    (dim × n_planes) matmul per batch. A plan-literal expression per
    plane would inline dim × n_planes constants into the plan — fine at
    dim 64, megabytes of plan at 768-d embeddings — and evaluate dot
    products element-wise; the matmul is both compact and BLAS-fast."""
    from pyspark.sql import types as T

    weights = planes.T.copy()  # (dim, n_planes)
    powers = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ weights) >= 0
        return pd.Series((bits * powers).sum(axis=1).astype(np.int32))

    return bucket_udf


def add_lsh_buckets(
    embeddings: DataFrame, n_planes: int = 8, dim: int | None = None,
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    out = embeddings.withColumn("bucket", _lsh_bucket_udf(planes)(F.col(vec_col)))
    return out, planes


def _neighbor_buckets(bucket: int, n_planes: int, n_probe_bits: int) -> list[int]:
    """All bucket ids within Hamming distance n_probe_bits of bucket."""
    out = {bucket}
    for r in range(1, n_probe_bits + 1):
        for flip in itertools.combinations(range(n_planes), r):
            b = bucket
            for f in flip:
                b ^= 1 << f
            out.add(b)
    return sorted(out)


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket
    neighborhood, bucketing computed on the fly. The persisted-table
    variant (:func:`write_lsh_bucketed` + :func:`lsh_bucket_topk_table`)
    turns the bucket IN-filter into parquet partition pruning — the
    100 TB path scans only the probed buckets' files."""
    bucketed, planes = add_lsh_buckets(embeddings, n_planes=n_planes,
                                       dim=len(query_vec), vec_col=vec_col)
    probe = _probe_buckets(query_vec, planes, n_probe_bits)
    cand = bucketed.where(F.col("bucket").isin(probe))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _probe_buckets(query_vec: list[float], planes: np.ndarray,
                   n_probe_bits: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ q >= 0).astype(np.int64)
    qbucket = int((qbits << np.arange(planes.shape[0])).sum())
    return _neighbor_buckets(qbucket, planes.shape[0], n_probe_bits)


def write_lsh_bucketed(
    embeddings: DataFrame, out_dir: str, n_planes: int = 8,
    dim: int | None = None, vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the embedding table ``partitionBy("bucket")`` so
    query-time bucket IN-filters prune at the file-listing level (the
    ANN analog of the postings' bucket partitioning). Returns the
    hyperplanes (deterministic — recomputable from (dim, n_planes))."""
    bucketed, planes = add_lsh_buckets(embeddings, n_planes=n_planes,
                                       dim=dim, vec_col=vec_col)
    (
        bucketed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    return planes


def lsh_bucket_topk_table(
    spark,
    table_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a :func:`write_lsh_bucketed` table: the bucket
    IN-filter is a partition filter (check PartitionFilters in
    .explain), so only the probed buckets' files are read."""
    planes = _hyperplanes(len(query_vec), n_planes)
    probe = _probe_buckets(query_vec, planes, n_probe_bits)
    cand = spark.read.parquet(table_dir).where(F.col("bucket").isin(probe))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def _centroid_features(embeddings: DataFrame, centroids: np.ndarray,
                       vec_col: str) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — one
    vectorized Arrow batch matmul per partition, no shuffle."""
    from pyspark.sql import types as T

    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ c.T).argmax(axis=1).astype(np.int32))

    return embeddings.withColumn("cluster", assign_udf(F.col(vec_col)))


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd iterations for the IVF coarse quantizer.

    Seeds are the vectors with the smallest ``murmur3(vec_id)`` (a
    deterministic pseudo-random sample — no RNG state, invariant under
    partitioning; ties broken by id). Updates run distributed:
    assignment is a vectorized Arrow matmul, the centroid mean is
    ``posexplode → groupBy(cluster, dim) → avg`` (k×dim rows to the
    driver per iteration — tiny).

    The trainer is CROSS-ENGINE reproducible, not merely
    run-to-run deterministic: centroid means are quantized to 6
    decimals each iteration, so an independent replay (the DuckDB
    oracle unrolls these same iterations as SQL CTEs) lands on
    bit-identical centroids — float summation-order noise cannot
    accumulate across iterations. Assignment needs no such guard:
    argmax_c(v̂·c) is invariant to v's normalization, so both engines
    compare raw dot products and ties break by lowest cluster index.
    """
    from ..functions.hashes import murmur3_u32

    dim = len(embeddings.select(vec_col).first()[0])
    seeds = (
        embeddings.select(
            vec_col,
            murmur3_u32(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("h", "_id")
        .limit(n_centroids)
        .collect()
    )
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    for _ in range(n_iters):
        assigned = _centroid_features(embeddings, centroids, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r["cluster"], r["dim"]] = r["m"]
        centroids = new
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via IVF: score only vectors whose cluster is among the
    query's ``n_probe`` nearest centroids, assignment computed on the
    fly. The persisted variant (:func:`write_ivf_clustered` +
    :func:`ivf_topk_table`) turns the IN-filter into parquet partition
    pruning, so the 100 TB path reads n_probe/n_centroids of the files."""
    probe = _probe_clusters(query_vec, centroids, n_probe)
    assigned = _centroid_features(embeddings, centroids, vec_col)
    cand = assigned.where(F.col("cluster").isin(probe))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _probe_clusters(query_vec: list[float], centroids: np.ndarray,
                    n_probe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    sims = cn @ qn
    # stable (sim DESC, cluster ASC) — ties resolve identically in the
    # SQL replay's `ORDER BY cos DESC, cluster`
    order = np.lexsort((np.arange(sims.size), -sims))
    return [int(p) for p in order[:n_probe]]


def write_ivf_clustered(
    embeddings: DataFrame, out_dir: str, centroids: np.ndarray,
    vec_col: str = "embedding",
) -> None:
    """Materialize embeddings ``partitionBy("cluster")`` (IVF posting
    lists as a partitioned table)."""
    assigned = _centroid_features(embeddings, centroids, vec_col)
    (
        assigned.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(out_dir)
    )


def ivf_topk_table(
    spark,
    table_dir: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a :func:`write_ivf_clustered` table — the cluster
    IN-filter prunes partitions at the file listing."""
    probe = _probe_clusters(query_vec, centroids, n_probe)
    cand = spark.read.parquet(table_dir).where(F.col("cluster").isin(probe))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup (a < b) pairs with cosine >= threshold, candidates from
    same-LSH-bucket equi-join (high-cosine pairs almost surely share
    the full sign pattern; recall is tested vs brute force)."""
    bucketed, _ = add_lsh_buckets(embeddings, n_planes=n_planes, vec_col=vec_col)
    x = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    y = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    return (
        x.join(y, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .distinct()
    )


def cosine_dup_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force O(n^2) variant — the small-scale oracle baseline."""
    x = embeddings.select(F.col(id_col).alias("a"),
                          F.col(vec_col).cast("array<double>").alias("va"))
    y = embeddings.select(F.col(id_col).alias("b"),
                          F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        x.crossJoin(y)
        .where(F.col("a") < F.col("b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
) -> DataFrame:
    """Semantic deduplication over an embedding column (SemDeDup,
    Abbas et al. 2023, arXiv:2303.09540): drop every vector that has
    a LOWER-id neighbor with cosine >= ``threshold``; return the kept
    rows (full input columns). Deterministic keep-lowest-id in place
    of the paper's keep-farthest-from-centroid — same dedup set size,
    reproducible under repartitioning, and expressible in plain SQL
    for the oracle.

    ``method="lsh"`` (default, the scale path): candidate pairs from
    :func:`cosine_dup_pairs`'s same-sign-bucket equi-join — the
    cluster-scoped pairing the paper uses k-means for, never
    all-pairs. ``method="exact"``: brute-force pairs
    (:func:`cosine_dup_pairs_exact`), the small-scale oracle
    baseline — O(n²), labeled as such.

    The drop set is id-only (8 bytes/row) and near-dup-sized, so the
    anti-join broadcasts; at 100 TB the cost is the bucketed
    self-join, which is bounded by bucket occupancy exactly like
    minhash-LSH dedup."""
    if method == "lsh":
        pairs = cosine_dup_pairs(embeddings, threshold, n_planes,
                                 id_col, vec_col)
    elif method == "exact":
        pairs = cosine_dup_pairs_exact(embeddings, threshold,
                                       id_col, vec_col)
    else:
        raise ValueError(f"method must be lsh|exact, got {method!r}")
    drops = pairs.select(F.col("b").alias(id_col)).distinct()
    return embeddings.join(drops, id_col, "left_anti")


# -- int8 quantization ---------------------------------------------------------

def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(127 *
    v_i / max|v| + 0.5)`` with the scale kept alongside — the
    standard serving-side compression for ANN (4× less memory/IO than
    float32; at 100 TB of vectors the scan cost IS the search cost).
    Pure JVM expressions, map-only. Rounding is an explicit
    ``floor(x + 0.5)`` — not ``round()`` — so the oracle replays the
    boundary cases bit-exactly. Zero vectors quantize to zeros with
    scale 0.

    Returns ``(id, qvec array<int>, scale double)``; cosine between
    quantized vectors needs no dequantization:
    ``cos ≈ (qa·qb) / (|qa| |qb|)`` (the per-vector scales cancel).
    """
    v = F.col(vec_col).cast("array<double>")
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # ANSI mode raises on x/0 even inside the un-taken CASE branch
    # (the HOF is CodegenFallback-evaluated); a floor > 0 keeps the
    # divisor legal — the m = 0 rows take the zeros branch regardless
    safe = F.greatest(m, F.lit(1e-300)) / 127.0
    q = F.when(
        m > 0,
        F.transform(v, lambda x: F.floor(x / safe + 0.5).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return embeddings.select(
        F.col(id_col),
        q.alias("qvec"),
        F.round(m / 127.0, 9).alias("scale"),
    )


def cosine_topk_int8(
    quantized: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine over an int8-quantized table: the query
    quantizes driver-side with the same rule, the dot product runs in
    INTEGER arithmetic (exact in both engines — dims × 127² stays far
    under 2^53), and the scales cancel out of the cosine entirely.
    One scan + TakeOrderedAndProject, same plan shape as
    :func:`cosine_topk`; recall vs the float path is bounded by the
    quantization error (tested)."""
    import math

    mq = max(abs(float(x)) for x in query_vec) or 1.0
    qq = [int(math.floor(x / (mq / 127.0) + 0.5)) for x in query_vec]
    nq = math.sqrt(sum(x * x for x in qq)) or 1.0
    qcol = F.array(*[F.lit(x) for x in qq])
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), qcol, lambda a, b: a.cast("long") * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.transform(F.col("qvec"),
                        lambda a: a.cast("long") * a),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    score = F.when(
        nv > 0,
        F.round(
            dot.cast("double")
            / (F.greatest(nv, F.lit(1e-300)) * F.lit(float(nq))),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        quantized.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the classic memory-scale ANN path
# (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011): split the vector into m subspaces, k-means
# each subspace to 2^nbits codewords, store m small codes per vector
# (m bytes at nbits=8 vs 4·dim float bytes), and answer queries with
# asymmetric distance computation (ADC) — a driver-computed m×k table
# of query-subvector · codeword dot products, summed per vector by
# code lookup. At 100 TB of embeddings the codes table is ~dim/2·m×
# smaller than the raw vectors, and scoring never touches a float
# vector again.
# ---------------------------------------------------------------------------


def _pq_shapes(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m} subspaces")
    return dim // m


def _pq_assign_scores(x: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, dim) vectors × (m, k, dsub) codebooks -> (n, m) int32 codes.

    Per subspace j: argmax over codes of ``round(2·x_j·c − c·c, 6)``
    (the L2-argmin rewritten without the per-vector constant), first
    max wins. The 6-dp quantization is the cross-engine contract: the
    DuckDB replay computes the same score with SQL sums, and rounding
    kills last-ulp summation-order drift before the argmax."""
    n, dim = x.shape
    m, k, dsub = codebooks.shape
    xs = x.reshape(n, m, dsub)
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        cb = codebooks[j]  # (k, dsub)
        s = np.round(2.0 * (xs[:, j, :] @ cb.T) - np.sum(cb * cb, axis=1), 6)
        codes[:, j] = s.argmax(axis=1)
    return codes


def _pq_encode_udf(codebooks: np.ndarray, vec_col: str):
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = _pq_assign_scores(x, codebooks)
        return pd.Series(list(codes))

    return enc(F.col(vec_col))


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    nbits: int = 3,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic per-subspace Lloyd iterations -> codebooks
    ``(m, 2^nbits, dim/m)`` float64.

    Same cross-engine-reproducible discipline as :func:`ivf_train`:
    seeds are the ``k`` vectors with smallest ``murmur3(vec_id)``
    (each seed sliced into its m subvectors — no per-subspace RNG),
    assignment quantizes its score to 6 dp before the argmax (ties to
    the lowest code), and centroid means are rounded to 6 dp per
    iteration, so an independent SQL replay lands on bit-identical
    codebooks. ALL m subspaces update in ONE distributed pass per
    iteration: explode to (dim, value), derive (sub = dim ÷ dsub,
    code = codes[sub]), groupBy (sub, code, dim) avg — m·k·dsub rows
    to the driver per iteration. Empty clusters keep their previous
    codeword (the coalesce rule)."""
    k = 1 << int(nbits)
    from ..functions.hashes import murmur3_u32

    first = embeddings.select(vec_col).first()
    dim = len(first[0])
    dsub = _pq_shapes(dim, m)
    seeds = (
        embeddings.select(
            vec_col,
            murmur3_u32(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("h", "_id")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"need at least {k} vectors to seed {k} codes")
    seedmat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    codebooks = np.stack(
        [seedmat[:, j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, k, dsub)

    for _ in range(n_iters):
        enc = embeddings.withColumn("_codes", _pq_encode_udf(codebooks, vec_col))
        means = (
            enc.select("_codes", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .withColumn("sub", (F.col("dim") / dsub).cast("int"))
            .withColumn("code", F.element_at("_codes", F.col("sub") + 1))
            .groupBy("sub", "code", "dim")
            .agg(F.round(F.avg("v"), 6).alias("mval"))
            .collect()
        )
        new = codebooks.copy()
        for r in means:
            new[r["sub"], r["code"], r["dim"] - r["sub"] * dsub] = r["mval"]
        codebooks = new
    return codebooks


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes array<int> length m): the stored form. m·nbits
    bits of payload per vector replace 32·dim — the table a 100 TB
    deployment persists (partition/bucket by id range; codebooks ride
    beside it as a tiny sidecar)."""
    return embeddings.select(
        F.col(id_col), _pq_encode_udf(codebooks, vec_col).alias("codes")
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k over PQ codes -> (id, score): score is the
    reconstructed dot product ``Σ_j q_j · codeword_j`` rounded to 6 dp
    (descending, ties to lowest id). The m×k lookup table is computed
    once on the driver; per-row work is m integer lookups + a sum —
    vectorized NumPy fancy-indexing per Arrow batch, then one
    TakeOrderedAndProject. No float vectors are read."""
    from pyspark.sql import types as T

    m, kk, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.size != m * dsub:
        raise ValueError(f"query dim {q.size} != {m * dsub}")
    table = np.stack(
        [codebooks[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, k)

    @F.pandas_udf(T.DoubleType())
    def adc(codes: pd.Series) -> pd.Series:
        c = np.stack([np.asarray(v, dtype=np.int64) for v in codes])
        return pd.Series(
            np.round(table[np.arange(m), c].sum(axis=1), 6)
        )

    return (
        encoded.select(F.col(id_col), adc(F.col(codes_col)).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def write_pq_table(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the PQ deployment artifact: ``codes/`` parquet (id +
    m-byte codes — the only thing queries scan) beside a
    ``codebooks.json`` sidecar (m·k·dsub floats — driver-sized).
    Write order: codes first, sidecar last — its presence is the
    completion marker, mirroring the index build's stats.json."""
    import json
    import os

    codes_dir = os.path.join(out_dir, "codes")
    pq_encode(embeddings, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(codes_dir)
    tmp = os.path.join(out_dir, "codebooks.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"shape": list(codebooks.shape),
             "values": codebooks.ravel().tolist()}, f
        )
    os.replace(tmp, os.path.join(out_dir, "codebooks.json"))


def pq_topk_table(
    spark,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k against a persisted PQ table (write_pq_table)."""
    import json
    import os

    with open(os.path.join(out_dir, "codebooks.json")) as f:
        d = json.load(f)
    codebooks = np.asarray(d["values"], dtype=np.float64).reshape(d["shape"])
    codes = spark.read.parquet(os.path.join(out_dir, "codes"))
    return pq_topk(codes, codebooks, query_vec, k=k, id_col=id_col)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + product-quantized residuals — the
# composition every billion-scale ANN deployment actually runs
# (FAISS's IndexIVFPQ; Jégou et al. 2011 §IV). The coarse centroid
# prunes the scan (n_probe/n_centroids of the codes table), the PQ
# codes of the RESIDUAL (v − centroid) carry the fine geometry, and
# the query reconstructs ``q·v ≈ q·centroid + q·codeword`` from a
# per-cluster constant plus m table lookups.
# ---------------------------------------------------------------------------


def _residual_frame(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cluster, vec − centroid[cluster]) in one Arrow batch pass.

    Assignment is :func:`_assign_raw_q` (raw dot, 6-dp-quantized,
    ties to the lowest cluster) — bit-reproducible in the SQL replay,
    which every downstream IVF-PQ byte depends on."""
    from pyspark.sql import types as T

    c = centroids

    @F.pandas_udf(
        T.StructType([
            T.StructField("cluster", T.IntegerType()),
            T.StructField("r", T.ArrayType(T.DoubleType())),
        ])
    )
    def resid(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        cl = _assign_raw_q(x, c)
        r = x - c[cl]
        return pd.DataFrame(
            {"cluster": cl.astype(np.int32), "r": list(r)}
        )

    out = embeddings.select(
        F.col(id_col), resid(F.col(vec_col)).alias("_rc")
    )
    return out.select(
        F.col(id_col),
        F.col("_rc.cluster").alias("cluster"),
        F.col("_rc.r").alias(vec_col),
    )


def _assign_raw_q(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """argmax over clusters of ``round(v·c, 6)`` (first max wins — the
    SQL replay's ORDER BY score DESC, cluster ASC). The quantization
    makes assignment bit-reproducible across engines, which the IVF-PQ
    pipeline NEEDS: unlike plain IVF (whose final cosine never touches
    a centroid), every IVF-PQ score is built FROM centroids and
    codebooks, so one flipped assignment anywhere in training shows up
    in the output."""
    return np.round(x @ centroids.T, 6).argmax(axis=1)


def _ivf_train_raw(
    embeddings: DataFrame,
    n_centroids: int,
    n_iters: int,
    id_col: str,
    vec_col: str,
) -> np.ndarray:
    """Lloyd iterations with the raw-quantized assignment rule
    (:func:`_assign_raw_q`) — the IVF-PQ coarse trainer. Seeding and
    the 6-dp mean quantization are exactly :func:`ivf_train`'s."""
    from pyspark.sql import types as T

    from ..functions.hashes import murmur3_u32

    seeds = (
        embeddings.select(
            vec_col,
            murmur3_u32(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("h", "_id")
        .limit(n_centroids)
        .collect()
    )
    if len(seeds) < n_centroids:
        # mirror pq_train's guard: np.stack would otherwise silently
        # yield fewer centroids than requested
        raise ValueError(
            f"need at least n_centroids={n_centroids} vectors to seed "
            f"IVF-PQ coarse training, got {len(seeds)}"
        )
    centroids = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seeds]
    )
    for _ in range(n_iters):
        c = centroids

        @F.pandas_udf(T.IntegerType())
        def assign_udf(vecs: pd.Series) -> pd.Series:
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            return pd.Series(_assign_raw_q(x, c).astype(np.int32))

        assigned = embeddings.withColumn("cluster", assign_udf(F.col(vec_col)))
        means = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r["cluster"], r["dim"]] = r["m"]
        centroids = new
    return centroids


def ivfpq_train(
    embeddings: DataFrame,
    n_centroids: int = 8,
    ivf_iters: int = 2,
    m: int = 8,
    nbits: int = 3,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """-> (centroids (C, dim), codebooks (m, 2^nbits, dim/m)): the IVF
    coarse quantizer trained first, then PQ trained on the residuals —
    both with the deterministic cross-engine contracts of their
    standalone trainers (murmur3 seeds, 6-dp quantization)."""
    centroids = _ivf_train_raw(
        embeddings, n_centroids, ivf_iters, id_col, vec_col
    )
    resid = _residual_frame(embeddings, centroids, id_col, vec_col)
    codebooks = pq_train(resid, m, nbits, pq_iters, id_col, vec_col)
    return centroids, codebooks


def ivfpq_encode(
    embeddings: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cluster, codes): cluster for the probe prune, m codes
    for the residual — 4 + m bytes a row at nbits<=8. Persist
    partitioned by cluster and the probe becomes file pruning, exactly
    like :func:`write_ivf_clustered`."""
    resid = _residual_frame(embeddings, centroids, id_col, vec_col)
    return resid.select(
        F.col(id_col),
        F.col("cluster"),
        _pq_encode_udf(codebooks, vec_col).alias("codes"),
    )


def ivfpq_topk(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC over probed clusters: score = round(q·centroid[cluster] +
    Σ_j q_j·codeword_j, 6) desc, ties to lowest id. Driver-side work
    is one (C,) base vector and one (m, k) table; per row: one base
    lookup + m table lookups, vectorized per Arrow batch."""
    from pyspark.sql import types as T

    m, kk, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.size != m * dsub:
        raise ValueError(f"query dim {q.size} != {m * dsub}")
    probe = _probe_clusters(query_vec, centroids, n_probe)
    base = centroids @ q  # (C,)
    table = np.stack(
        [codebooks[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )

    @F.pandas_udf(T.DoubleType())
    def adc(clusters: pd.Series, codes: pd.Series) -> pd.Series:
        c = np.stack([np.asarray(v, dtype=np.int64) for v in codes])
        s = base[clusters.to_numpy()] + table[np.arange(m), c].sum(axis=1)
        return pd.Series(np.round(s, 6))

    return (
        encoded.where(F.col("cluster").isin(probe))
        .select(
            F.col(id_col),
            adc(F.col("cluster"), F.col("codes")).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )
