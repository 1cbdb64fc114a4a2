"""Document deduplication operators for large-scale corpus curation.

Beyond the reference's only dedup (``.distinct()`` on (entity, video)
pairs, /root/reference/README.md:424, and JS ``Set`` dedup,
server/src/utils/index.js:26-31), a 100 TB training-data pipeline needs
document-level near-dup removal. All operators here are DataFrame
compositions (shuffle-aware, no driver materialization):

  * exact dedup — hash-groupBy on a content digest;
  * n-gram Jaccard — shingle explode + self-equi-join on shingle +
    |A∩B| / |A∪B| (the join key is the shingle, so only docs sharing at
    least one shingle are ever paired — never a cross join);
  * MinHash + LSH — counter-based affine minhash signatures
    (vectorized pandas UDF), banded into LSH buckets, candidate pairs
    from bucket equi-joins, verified by true Jaccard;
  * SimHash — 64-bit hyperplane-free simhash over token hashes,
    banded by 16-bit chunks for candidate generation, verified by
    Hamming distance;
  * embedding near-dup — cosine threshold over LSH-bucketed vectors
    (delegates to operators.similarity).

Determinism: every hash is xxhash64/splitmix64-derived — no RNG state,
so results are invariant under partitioning and parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tokenizer import tokens_col

# -- exact -------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each byte-identical text.

    One hash aggregation on the digest — at 100 TB the digest groupBy
    shuffles 16-byte keys instead of full documents.
    """
    return (
        docs.withColumn("_digest", F.md5(F.col(text_col)))
        .groupBy("_digest")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .drop("_digest")
    )


def exact_dup_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(keep_id, dup_id) pairs of byte-identical docs (dup_id removed)."""
    keyed = docs.select(F.md5(F.col(text_col)).alias("_digest"), F.col(id_col))
    winners = keyed.groupBy("_digest").agg(F.min(id_col).alias("keep_id"))
    return (
        keyed.join(winners, "_digest")
        .where(F.col(id_col) != F.col("keep_id"))
        .select("keep_id", F.col(id_col).alias("dup_id"))
    )


# -- shingles / n-gram Jaccard ----------------------------------------------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    ).where(F.size("toks") >= n)  # <n tokens -> no n-grams
    sh = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
            )
        ).alias("shingle"),
    ).where(F.length("shingle") > 0)
    return sh.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a < b) with shingle-set Jaccard >= threshold.

    Shuffles on the shingle key (bounded by corpus token count), then
    on the (a, b) pair key — never materializes the doc×doc cross
    product. Zipf-head shingles behave like skewed join keys: a shingle
    with df=d contributes d² candidate rows to the self-join, so at web
    scale pass ``max_shingle_df`` to drop head shingles before the join
    (they carry almost no Jaccard discrimination). With a cap, both the
    per-doc set sizes and intersections are computed over the capped
    shingle sets, so the Jaccard stays internally consistent.
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# -- MinHash + LSH ------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _affine_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors via splitmix64."""
    from ..corpus import _splitmix64

    ids = np.arange(1, n_hashes + 1, dtype=np.uint64)
    a = (_splitmix64(ids) % np.uint64(_MERSENNE - 1)) + np.uint64(1)
    b = _splitmix64(ids ^ np.uint64(0xDEADBEEF)) % np.uint64(_MERSENNE)
    return a.astype(np.uint64), b.astype(np.uint64)


def shingle_hashes(docs: DataFrame, shingle_n: int = 3,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh array<long>) word-shingle hashes, pure JVM.

    Shingle at position p = murmur3 of the space-joined tokens
    p..p+n-1 (functions.hashes — replays exactly in DuckDB SQL);
    rows with 0 < len < n contribute ONE gram joining all their
    tokens; empty/null rows an empty array."""
    from ..functions.hashes import murmur3_u32

    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    full = F.transform(
        F.sequence(F.lit(1), n - shingle_n + 1),
        lambda i: murmur3_u32(F.concat_ws(" ", F.slice(toks, i, shingle_n))),
    )
    short = F.array(murmur3_u32(F.concat_ws(" ", toks)))
    sh = (
        F.when(n >= shingle_n, full)
        .when(n > 0, short)
        .otherwise(F.array().cast("array<long>"))
    )
    return docs.select(F.col(id_col), sh.alias("sh"))


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 64, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>) minhash signatures.

    Two stages, both DuckDB-replayable (the operator sits on the
    value-hash oracle board):

    * shingle hashing stays JVM (:func:`shingle_hashes` — murmur3 of
      the joined token window, exactly expressible in SQL via
      functions.hashes);
    * the n_hashes affine permutations run as one Arrow-batched pandas
      UDF over the fixed-width hash arrays — a (batch × n_hashes)
      ``np.minimum.reduceat``, no per-row Python. Each permutation is
      ``((sh*a + b) mod 2^64) mod (2^61-1)`` — the uint64 wraparound
      is part of the definition so DuckDB replays it with hugeint-mod.
    """
    a_vec, b_vec = _affine_params(n_hashes)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        counts = hashes.map(
            lambda a: 0 if a is None else len(a)
        ).to_numpy(np.int64)
        n_rows = len(counts)
        sig = np.zeros((n_rows, n_hashes), dtype=np.int64)
        nz = np.flatnonzero(counts)
        if len(nz):
            sh = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hashes[counts > 0]]
            ).astype(np.uint64)
            offsets = np.zeros(len(nz), dtype=np.int64)
            offsets[1:] = np.cumsum(counts[nz])[:-1]
            M = np.uint64(_MERSENNE)
            for k in range(n_hashes):
                vals = (sh * a_vec[k] + b_vec[k]) % M
                sig[nz, k] = np.minimum.reduceat(vals, offsets).astype(
                    np.int64
                )
        return pd.Series(list(sig))

    sh = shingle_hashes(docs, shingle_n, text_col, id_col)
    return sh.select(F.col(id_col), sig_udf(F.col("sh")).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 64, bands: int = 16,
    shingle_n: int = 3, threshold: float = 0.7,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature similarity.

    rows_per_band = n_hashes // bands; two docs collide if any band of
    their signatures matches exactly. Collisions shuffle on the
    (band_id, band_hash) key; final similarity = fraction of matching
    minhash components (unbiased Jaccard estimate).
    """
    if n_hashes % bands:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, shingle_n, text_col, id_col)
    sigs = sigs.persist()
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.xxhash64(F.concat_ws(",", F.slice("sig", bnd * r + 1, r))),
            )
        ).alias("band", "band_hash"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "band_hash"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    verified = (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
            / F.lit(float(n_hashes)),
        )
        .where(F.col("est_jaccard") >= threshold)
        .select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )
    return verified


# -- SimHash ------------------------------------------------------------------

SIMHASH_HI_SALT = "hi"


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash over token hashes (tf-weighted): bit k of the
    signature is the majority vote of bit k across the document's
    token hashes (duplicates weighted by occurrence).

    Split for both speed and oracle-ability:

    * HASHING stays JVM: token hash = two independent Murmur3_x86_32
      words (Spark's built-in ``hash()``; the high word chains a salt
      round — see functions.hashes), carried as non-negative sub-2^32
      longs. Murmur3 replays exactly in DuckDB SQL
      (functions.hashes.sql_murmur3_u32_duckdb), so the signatures AND
      the near-dup pairs built on them sit on the DuckDB correctness
      board.
    * BIT PACKING is an Arrow-batched pandas UDF over the fixed-width
      hash arrays, batch-vectorized exactly like minhash: one
      concatenate of the batch's hash arrays, 64 shift-and-mask passes
      with per-row ``np.add.reduceat`` majority counts — no per-row
      Python. (A pure-JVM 64-fold formulation was measured too: HOF
      ``aggregate`` is interpreted, not codegen'd, and ran ~2.5x
      slower than this at 80k docs; the former row-at-a-time UDF was
      ~2.9x slower — BENCH.md: simhash entry.)
    """
    from ..functions.hashes import murmur3_u32

    toks = tokens_col(F.col(text_col))
    step1 = docs.select(
        F.col(id_col),
        F.transform(toks, lambda w: murmur3_u32(w, SIMHASH_HI_SALT)).alias("_hi"),
        F.transform(toks, lambda w: murmur3_u32(w)).alias("_lo"),
    )

    @F.pandas_udf(T.LongType())
    def pack(his: pd.Series, los: pd.Series) -> pd.Series:
        n_rows = len(his)
        counts = his.map(lambda a: 0 if a is None else len(a)).to_numpy(np.int64)
        out = np.zeros(n_rows, dtype=np.uint64)
        nz = np.flatnonzero(counts)
        if len(nz):
            mask = counts > 0
            flat_hi = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in his[mask]]
            )
            flat_lo = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in los[mask]]
            )
            seg = counts[nz]
            offsets = np.zeros(len(nz), dtype=np.int64)
            offsets[1:] = np.cumsum(seg)[:-1]
            acc = np.zeros(len(nz), dtype=np.uint64)
            for k in range(64):
                src, s = (flat_lo, k) if k < 32 else (flat_hi, k - 32)
                cnt = np.add.reduceat((src >> s) & 1, offsets)
                acc |= (cnt * 2 >= seg).astype(np.uint64) << np.uint64(k)
            out[nz] = acc
        return pd.Series(out.astype(np.int64))

    return step1.select(F.col(id_col), pack("_hi", "_lo").alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming.

    Candidate generation: band the 64-bit hash into ``max_hamming + 1``
    disjoint bit chunks — by pigeonhole, a pair with at most
    ``max_hamming`` differing bits must agree exactly on at least one
    chunk (there are more chunks than differing bits), so an equi-join
    on (chunk_id, chunk) finds ALL true pairs without a cross join.
    Chunk widths are 64 // n_chunks, first chunks one bit wider for the
    remainder. Verification: popcount of XOR. Smaller chunks (higher
    max_hamming) mean more collisions to verify — the standard
    recall/cost trade of Hamming-space banding.
    """
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    base, rem = divmod(64, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets = np.concatenate(([0], np.cumsum(widths)[:-1])).tolist()
    sigs = simhash_signatures(docs, text_col, id_col).persist()
    def _chunk(off: int, w: int):
        # a full-width chunk (max_hamming=0) needs no mask — and
        # (1 << 64) - 1 would overflow the long literal anyway
        shifted = F.shiftrightunsigned(F.col("simhash"), off)
        return shifted if w == 64 else shifted.bitwiseAND(F.lit((1 << w) - 1))

    chunks = sigs.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(*[
                _chunk(int(off), w) for off, w in zip(offsets, widths)
            ])
        ).alias("chunk_id", "chunk"),
    )
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk_id", "chunk"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"),
            F.col(f"y.{id_col}").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# -- duplicate clustering (connected components) -------------------------------

def _canonical_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge set as canonical (u < v) rows, self-loops dropped."""
    e = pairs.select(F.col(a).cast("long").alias("u"),
                     F.col(b).cast("long").alias("v"))
    return (
        e.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"),
            F.greatest("u", "v").alias("v"),
        )
        .distinct()
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star / small-star contraction round (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm). ``edges`` is the canonical (u < v) undirected set.

    Per node u let m(u) = min(N(u) ∪ {u}). Large-star connects every
    strictly-larger neighbor of u to m(u); small-star connects every
    smaller-or-equal neighbor (and u itself) to m(u). Alternating the
    two converges to stars rooted at each component's minimum in
    O(log^2 n) rounds — no O(diameter) chain walks, so a pathological
    A~B~C~... similarity chain costs log rounds, not linear.
    """
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.min("v").alias("_mn")).select(
        "u", F.least(F.col("u"), F.col("_mn")).alias("m")
    )
    j = sym.join(m, "u")
    if large:
        out = j.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = j.where(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(m.select(F.col("u"), F.col("m").alias("v")))
    return (
        out.where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )


def dup_clusters(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 50,
) -> DataFrame:
    """Group near-duplicate PAIRS into duplicate CLUSTERS — the step a
    real curation pipeline runs after MinHash/SimHash/Jaccard pair
    generation, so each group keeps one canonical document. Returns
    (doc_id, cluster_id) with ``cluster_id`` = the component's minimum
    doc id (the conventional canonical representative).

    Connected components via alternating large-star / small-star
    contraction (public MapReduce algorithm, O(log^2 n) rounds), each
    round a groupBy + join over the PAIR set — sized by the duplicate
    graph, never the corpus. ``localCheckpoint`` per round cuts the
    iterative lineage so plans stay flat at scale. Deterministic:
    min-based contraction has no RNG and no partition sensitivity.

    ``all_ids`` (optional, column ``id_col``) adds singleton docs that
    appear in no pair as their own cluster — the full corpus-side
    assignment used to materialize a deduplicated corpus.

    The reference's only grouping is a JS ``Set`` per term
    (server/src/utils/index.js:26-31); transitive duplicate grouping
    at corpus scale has no analog there and is built Spark-first.
    """
    edges = _canonical_edges(pairs, a, b).localCheckpoint()
    for _ in range(max_rounds):
        nxt = _star_round(edges, large=True)
        nxt = _star_round(nxt, large=False).localCheckpoint()
        # converged when the canonical edge set is unchanged
        if nxt.count() == edges.count() and nxt.exceptAll(edges).isEmpty():
            edges = nxt
            break
        edges = nxt
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = sym.groupBy("u").agg(F.min("v").alias("_mn")).select(
        F.col("u").alias(id_col),
        F.least(F.col("u"), F.col("_mn")).alias("cluster_id"),
    )
    if all_ids is not None:
        singles = (
            all_ids.select(F.col(id_col).cast("long").alias(id_col))
            .join(labels.select(id_col), id_col, "left_anti")
            .select(id_col, F.col(id_col).alias("cluster_id"))
        )
        labels = labels.unionByName(singles)
    return labels


# ------------------------------------------------------------------ #
# Exact duplicate-span removal (substring dedup, Lee et al. 2022)    #
# ------------------------------------------------------------------ #


def _span_occurrences(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Every token n-gram occurrence as ``(id, pos, h1, h2)`` — pos is
    the 0-based start token, (h1, h2) an INDEPENDENT 96-bit signature
    of the space-joined gram: ``xxhash64(gram)`` + unsalted 32-bit
    murmur (12-byte shuffle keys instead of ~n·token-length strings;
    tokens contain no spaces, so the join is injective). The gram
    array builds from arrays_zip of n shifted slices (the
    repetition_stats mechanism) — pure JVM expressions before the
    explode.

    The pair must NOT be built from one murmur plus a SALTED murmur:
    Spark's ``hash(col, lit(salt))`` CHAINS (the salt round is seeded
    by the first hash), so any h1 collision is automatically a pair
    collision and the signature discriminates only 32 bits — measured
    over-flagging at a few-hundred-thousand-gram corpus (round-4
    sf0.1 board catch). xxhash64 and murmur3 are unrelated functions,
    so the pair is a true 96-bit key: ~birthday(2^96), safe past
    10^13 grams."""
    from ..functions.hashes import murmur3_u32
    from ..functions.tokenizer import tokens_col

    toks = tokens_col(F.col(text_col))
    span = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, span) for i in range(n)])
    occ = docs.select(F.col(id_col), F.posexplode(z).alias("pos", "_g"))
    gram = F.concat_ws(" ", *[F.col(f"_g.{i}") for i in range(n)])
    return occ.select(
        F.col(id_col),
        F.col("pos"),
        F.xxhash64(gram).alias("h1"),
        murmur3_u32(gram).alias("h2"),
    )


def _flagged_occurrences(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """Occurrences joined to their gram's corpus-wide stats, with a
    ``dup`` flag: an occurrence is a duplicate iff its gram occurs
    more than once corpus-wide AND it is not the gram's FIRST
    occurrence (minimum (id, pos) — the keep-first winner, a pure
    function of the data)."""
    occ = _span_occurrences(docs, n, text_col, id_col)
    winners = occ.groupBy("h1", "h2").agg(
        F.count("*").alias("_df"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w"),
    )
    flagged = occ.join(winners, ["h1", "h2"])
    dup = (F.col("_df") > 1) & ~(
        (F.col(id_col) == F.col(f"_w.{id_col}"))
        & (F.col("pos") == F.col("_w.pos"))
    )
    return flagged.select(id_col, "pos", dup.alias("dup"))


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span census: per doc, total n-gram
    occurrences, how many are duplicates of an EARLIER occurrence
    anywhere in the corpus (keep-first: the minimum (id, pos) owns the
    gram), and the ratio — the exact-substring-dedup signal of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"; they use 50-token spans over a suffix array). Docs
    shorter than ``n`` tokens report 0/0/0.0.

    100 TB shape: the occurrence table is ~|corpus tokens| rows of
    (id, pos, 16-byte gram key) — the honest cost of exact substring
    dedup, and still far below a distributed suffix array. The gram
    stats are a map-side-combinable groupBy on the hash pair; the
    join back is hash-keyed; per-doc rollup is one partial agg.
    The 96-bit (xxhash64, murmur) gram key risks ~birthday(2^96)
    collisions (a collision can only over-flag) — negligible past
    10^13 grams; key by the gram string itself to be bit-exact.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    flagged = _flagged_occurrences(docs, n, text_col, id_col)
    per = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.col("dup").cast("long")).alias("n_dup_grams"),
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(F.col("n_dup_grams") / F.col("n_grams"), 6),
            ).otherwise(F.lit(0.0)).alias("dup_ratio"),
        )
    )


def drop_duplicate_spans(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-SPAN removal (Lee et al. 2022 semantics,
    keep-first): every token covered by a duplicate n-gram occurrence
    — positions ``[pos, pos+n)`` of each occurrence that is not its
    gram's corpus-wide first — is cut; the surviving tokens rebuild
    the text in order (token-normalized, like ``dedup_lines``); docs
    losing every token drop out. The FIRST occurrence of each span
    survives, including the first of a within-doc repeat (the second
    copy inside one doc is removed too). Overlap edge effects (a cut
    span overlapping a kept span's tokens) resolve in favor of
    cutting, the standard approximation of the suffix-array method.

    Returns ``(id_col, text_col)`` — join back on id for the other
    columns. Scale shape: the coverage explode is ``n × duplicate
    occurrences`` rows (bounded by n·|tokens|, proportional to how
    much duplication exists); kept tokens shuffle once keyed by doc
    for the ordered rebuild."""
    from ..functions.tokenizer import tokens_col

    if n < 2:
        raise ValueError("n must be >= 2")
    flagged = _flagged_occurrences(docs, n, text_col, id_col)
    covered = (
        flagged.where("dup")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    posed = docs.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("p", "_tok"),
    )
    kept = posed.join(covered, [id_col, "p"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "_tok"))),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias(text_col)
    )
