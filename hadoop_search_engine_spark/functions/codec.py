"""Delta + varint posting-list codec, vectorized with NumPy.

Replaces the reference's text serialization of the inverted index
(``entity \\t file1, file2, ...`` — /root/reference/server/data/
part_r_00000.txt:1-4, parsed at server/src/utils/index.js:19-24) with
the compressed binary block layout used by real full-text engines:
sorted doc_ids are gap-encoded (delta from the previous id, the first
id stored as a delta from ``base``) and each gap / tf is written as an
LEB128-style varint (7 payload bits per byte, high bit = continuation).

Both directions are vectorized: encode computes per-value byte widths
and scatters payload bytes by offset; decode locates terminator bytes
(high bit clear), segments the byte stream into values, and
accumulates ``(b & 0x7f) << (7 * pos)`` per segment — no per-value
Python loop, so the same code path is fast inside Arrow UDF batches.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as concatenated varints."""
    v = np.asarray(values, dtype=_U64)
    if v.ndim != 1:
        raise ValueError("varint_encode expects a 1-D array")
    if v.size == 0:
        return b""
    # Number of 7-bit groups per value: max(1, ceil(bit_length / 7)).
    nbits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 is unsafe for 64-bit values; use a shift loop
    # over the fixed 10 possible widths instead (10 iterations total,
    # independent of array size).
    width = np.ones(v.shape, dtype=np.int64)
    shifted = v >> _U64(7)
    while shifted.any():
        width += (shifted > 0).astype(np.int64)
        shifted >>= _U64(7)
    del nbits, nz
    total = int(width.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(width)
    starts = ends - width
    # Byte position j of value i lives at starts[i] + j and holds
    # payload bits (v >> 7j) & 0x7f, with the continuation bit set on
    # all but the last byte.
    work = v.copy()
    alive = np.ones(v.shape, dtype=bool)
    for j in range(_MAX_VARINT_BYTES):
        if not alive.any():
            break
        idx = starts[alive] + j
        payload = (work[alive] & _U64(0x7F)).astype(np.uint8)
        is_last = (j + 1) == width[alive]
        out[idx] = payload | np.where(is_last, 0, 0x80).astype(np.uint8)
        work[alive] >>= _U64(7)
        alive = alive & (width > j + 1)
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, expected: int | None = None) -> np.ndarray:
    """Decode concatenated varints into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=_U64)
    is_term = (b & 0x80) == 0
    if not is_term[-1]:
        raise ValueError("truncated varint stream")
    n = int(is_term.sum())
    if expected is not None and n != expected:
        raise ValueError(f"expected {expected} varints, found {n}")
    ends = np.flatnonzero(is_term)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    if widths.max() > _MAX_VARINT_BYTES:
        raise ValueError("varint wider than 10 bytes")
    vals = np.zeros(n, dtype=_U64)
    alive = widths > 0
    for j in range(int(widths.max())):
        idx = starts[alive] + j
        vals[alive] |= (b[idx].astype(_U64) & _U64(0x7F)) << _U64(7 * j)
        alive = alive & (widths > j + 1)
    return vals


def delta_encode(doc_ids: np.ndarray, base: int = 0) -> np.ndarray:
    """Strictly-increasing doc_ids -> gaps (first gap relative to base).

    A zero gap after the first position would mean a duplicate doc_id
    in a posting list, which is illegal by construction — raise rather
    than silently emit an undecodable ambiguity.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return np.zeros(0, dtype=_U64)
    gaps = np.empty(d.shape, dtype=np.int64)
    gaps[0] = d[0] - base
    gaps[1:] = np.diff(d)
    if gaps[0] < 0 or (d.size > 1 and (gaps[1:] <= 0).any()):
        raise ValueError("doc_ids must be strictly increasing and >= base")
    return gaps.astype(_U64)


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=_U64).astype(np.int64)
    if g.size == 0:
        return np.zeros(0, dtype=np.int64)
    return base + np.cumsum(g)


def encode_doc_ids(doc_ids: np.ndarray, base: int = 0) -> bytes:
    return varint_encode(delta_encode(doc_ids, base=base))


def decode_doc_ids(buf: bytes, n: int | None = None, base: int = 0) -> np.ndarray:
    return delta_decode(varint_decode(buf, expected=n), base=base)


def decode_blocks(
    doc_bufs: list, tf_bufs: list, ns: np.ndarray, bases: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched decode of MANY posting blocks in one NumPy pass.

    Per-block ``varint_decode`` calls cost ~50 µs of Python/NumPy
    dispatch each — a head-term query touches thousands of blocks, so
    block-at-a-time decode costs ~1 s of pure overhead. Here all
    blocks' byte streams concatenate into one buffer, ONE varint pass
    decodes every gap, and the per-block delta reset is a cumsum
    correction: local cumsum per block = global cumsum minus the
    running total at each block's start (np.repeat-broadcast), plus the
    block's base.

    Returns (doc_ids, tfs, offsets) where offsets[i]:offsets[i+1]
    slices block i in the flat arrays.
    """
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(ns)])
    gaps = varint_decode(
        np.frombuffer(b"".join(map(bytes, doc_bufs)), dtype=np.uint8),
        expected=total,
    ).astype(np.int64)
    c = np.cumsum(gaps)
    starts = offsets[:-1]
    prev = np.where(starts > 0, c[starts - 1], 0)
    doc_ids = (
        c
        - np.repeat(prev, ns)
        + np.repeat(np.asarray(bases, dtype=np.int64), ns)
    )
    tfs = (
        varint_decode(
            np.frombuffer(b"".join(map(bytes, tf_bufs)), dtype=np.uint8),
            expected=total,
        ).astype(np.int64)
        + 1
    )
    return doc_ids, tfs, offsets


def encode_positions(positions: np.ndarray, counts: np.ndarray) -> bytes:
    """Per-doc position lists -> one varint blob for a block.

    ``positions`` is the block's flat occurrence-position array (doc-
    major, ascending within each doc); ``counts`` (= the block's tfs)
    gives each doc's slice. Within a doc, positions gap-encode; each
    doc's first position stores absolutely (delta from 0), so decode is
    the same per-group cumsum reset as :func:`decode_blocks`.
    """
    p = np.asarray(positions, dtype=np.int64)
    c = np.asarray(counts, dtype=np.int64)
    if p.size != int(c.sum()):
        raise ValueError("positions length must equal sum(counts)")
    if p.size == 0:
        return b""
    g = np.empty_like(p)
    g[0] = p[0]
    g[1:] = p[1:] - p[:-1]
    doc_starts = np.cumsum(c)[:-1]
    g[doc_starts] = p[doc_starts]
    if (g < 0).any() or (np.delete(g, np.concatenate([[0], doc_starts])) <= 0).any():
        raise ValueError("positions must be strictly increasing within a doc")
    return varint_encode(g.astype(_U64))


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions` -> flat position array."""
    c = np.asarray(counts, dtype=np.int64)
    total = int(c.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    gaps = varint_decode(
        np.frombuffer(bytes(buf), dtype=np.uint8), expected=total
    ).astype(np.int64)
    csum = np.cumsum(gaps)
    starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(c)[:-1]])
    prev = np.where(starts > 0, csum[starts - 1], 0)
    return csum - np.repeat(prev, c)


def encode_tfs(tfs: np.ndarray) -> bytes:
    t = np.asarray(tfs, dtype=np.int64)
    if (t <= 0).any():
        raise ValueError("term frequencies must be positive")
    # tf >= 1 always; store tf - 1 so the common tf=1 case is a zero byte.
    return varint_encode((t - 1).astype(_U64))


def decode_tfs(buf: bytes, n: int | None = None) -> np.ndarray:
    return varint_decode(buf, expected=n).astype(np.int64) + 1
