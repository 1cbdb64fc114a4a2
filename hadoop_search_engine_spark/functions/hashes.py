"""Cross-engine token hashes: Spark ``hash()`` (Murmur3_x86_32)
replayed exactly in DuckDB SQL.

The engine's *serving* hashes stay ``xxhash64`` (JVM-native 64-bit
shuffle keys). The *curation* operators that need a DuckDB-checkable
hash family (document fingerprinting, simhash) ride Spark's built-in
``hash()`` — Murmur3_x86_32 with seed 42, a handful of 32-bit
multiply/rotate/xor steps — because that is simple enough to express
exactly in DuckDB SQL over the UTF-8 bytes (hex-decoded two chars at a
time, 32-bit wraps via hugeint-mod). That keeps the Spark side a pure
JVM expression at full murmur speed (~10x cheaper than the md5 route,
which is the only hash both engines share natively) AND puts the
operator on the DuckDB correctness board.

Semantics replicated (verified against ``F.hash`` over ASCII, unicode,
and 0..40-byte fuzz strings, single- and two-argument forms):

* 4-byte little-endian blocks through mixK1 + mixH1;
* each TAIL byte individually through the same mix, as a SIGNED byte
  (Spark's ``hashUnsafeBytes``; canonical murmur3 instead accumulates
  the tail into one word — the two diverge on any input whose length
  isn't a multiple of 4);
* fmix with the total byte length;
* multi-argument ``hash(a, b)`` chains: the first hash becomes the
  second's seed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U32 = 1 << 32


def murmur3_u32(col: Column, salt: str | None = None) -> Column:
    """Spark: Murmur3_x86_32 of a string column as a long in [0, 2^32).

    ``salt`` chains a second murmur round over the salt string (the
    Spark ``hash(col, lit(salt))`` form). NOTE the chaining: the salt
    round is SEEDED by the unsalted hash, so a salted and an unsalted
    value are NOT independent — two inputs colliding unsalted collide
    under every salt too. Salting is for decorrelating SAMPLING
    decisions across operators (split/cap/budget salts), never for
    widening a signature; build multi-hash signatures from unrelated
    functions (e.g. xxhash64 + murmur, see dedup._span_occurrences —
    round-4 fix for exactly this trap).
    """
    h = F.hash(col) if salt is None else F.hash(col, F.lit(salt))
    return F.pmod(h.cast("long"), F.lit(_U32))


def mm3_u32_ref(data: bytes, seed: int = 42) -> int:
    """Pure-Python reference of Spark's hashUnsafeBytes murmur (tests +
    oracle sanity); returns the unsigned 32-bit value."""
    M = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & M

    def mix(h1: int, k1: int) -> int:
        k1 = (k1 * c1) & M
        k1 = (rotl(k1, 15) * c2) & M
        h1 ^= k1
        return (rotl(h1, 13) * 5 + 0xE6546B64) & M

    h1 = seed & M
    n = len(data)
    for i in range(n // 4):
        h1 = mix(h1, int.from_bytes(data[4 * i : 4 * i + 4], "little"))
    for i in range((n // 4) * 4, n):
        b = data[i]
        h1 = mix(h1, (b - 256) & M if b >= 128 else b)
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1


def mm3_u32_ref_str(s: str, salt: str | None = None) -> int:
    h = mm3_u32_ref(s.encode("utf-8"), 42)
    if salt is not None:
        h = mm3_u32_ref(salt.encode("utf-8"), h)
    return h


# --- DuckDB SQL emitter -------------------------------------------------------

def _sql_byte(hx: str, idx: str) -> str:
    """Byte ``idx`` (0-based SQL expr) of the hex string ``hx``."""
    return f"('0x' || substr({hx}, 2*({idx})+1, 2))::bigint"


def _sql_rotl(x: str, r: int) -> str:
    return f"((({x}) * {1 << r}) % {_U32} + ({x}) // {1 << (32 - r)})"


def _sql_mix(h: str, k: str) -> str:
    """mixH1(h, mixK1(k)) — 32-bit wraps via hugeint-mod on the two
    full-width multiplies; everything else stays bigint."""
    k1 = f"((({k})::hugeint * 3432918353) % {_U32})::bigint"
    k2 = f"(({_sql_rotl(k1, 15)}::hugeint * 461845907) % {_U32})::bigint"
    x = f"xor({h}, {k2})"
    return f"({_sql_rotl(x, 13)} * 5 + 3864292196) % {_U32}"


def sql_murmur3_u32_duckdb(expr: str, seed: str = "42") -> str:
    """DuckDB fragment computing the SAME value as :func:`murmur3_u32`
    (unsigned form) of string ``expr``, with ``seed`` any SQL expr in
    [0, 2^32). Single-element list_transform lambdas bind the hex bytes
    and byte count once (SQL has no ``let``)."""
    blocks = (
        f"list_transform(range(0, _nb // 4), _bi -> "
        f"{_sql_byte('_hx', '_bi*4')}"
        f" + {_sql_byte('_hx', '_bi*4+1')} * 256"
        f" + {_sql_byte('_hx', '_bi*4+2')} * 65536"
        f" + {_sql_byte('_hx', '_bi*4+3')} * 16777216)"
    )
    # tail bytes are SIGNED: b >= 128 reads as the 32-bit two's
    # complement (b - 256) mod 2^32 = b + (2^32 - 256)
    tail_byte = _sql_byte("_hx", "_ti")
    tail = (
        f"list_transform(range(_nb - _nb % 4, _nb), _ti -> "
        f"CASE WHEN {tail_byte} >= 128 THEN {tail_byte} + {_U32 - 256} "
        f"ELSE {tail_byte} END)"
    )
    h_blocks = (
        f"list_reduce(list_prepend(({seed})::bigint, {blocks}), "
        f"(_h1, _k1) -> {_sql_mix('_h1', '_k1')})"
    )
    h_all = (
        f"list_reduce(list_prepend({h_blocks}, {tail}), "
        f"(_h2, _k2) -> {_sql_mix('_h2', '_k2')})"
    )
    # fmix, one step per binding lambda (no let): f0..f4
    f0 = f"xor({h_all}, _nb)"
    f1 = f"xor(_f0, _f0 // 65536)"
    f2 = f"((_f1::hugeint * 2246822507) % {_U32})::bigint"
    f3 = f"xor(_f2, _f2 // 8192)"
    f4 = f"((_f3::hugeint * 3266489909) % {_U32})::bigint"
    f5 = f"xor(_f4, _f4 // 65536)"
    body = (
        f"list_transform([{f0}], _f0 -> "
        f"list_transform([{f1}], _f1 -> "
        f"list_transform([{f2}], _f2 -> "
        f"list_transform([{f3}], _f3 -> "
        f"list_transform([{f4}], _f4 -> {f5})[1])[1])[1])[1])[1]"
    )
    return (
        f"list_transform([hex(encode({expr}))], _hx -> "
        f"list_transform([octet_length(encode({expr}))], _nb -> "
        f"{body})[1])[1]"
    )
