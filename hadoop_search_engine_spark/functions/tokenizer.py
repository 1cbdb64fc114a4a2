"""The canonical tokenizer — one normalization rule, four parity impls.

Semantics are lifted verbatim from the reference's client-side query
tokenizer (/root/reference/client/src/utils/searchProcessor.ts:5 —
``toLowerCase().replace(/[.,!?]/g, "").split(/\\s+/)``) and its
index-side analog (``explode(split(lower($"location"), " "))``,
/root/reference/README.md:372-375). Index build, query parsing, the
DuckDB oracle and the NumPy oracle MUST tokenize byte-identically
(BASELINE.json per-row invariant), so every implementation lives here
and is covered by a golden-vector parity test:

  * :func:`tokenize` — pure Python (the oracle / driver-side query path)
  * :func:`tokens_col` — Spark Column expression (JVM, whole-stage
    codegen — the index-build hot path; no Python crosses the boundary)
  * :func:`tokenize_series` — pandas implementation used by the
    vectorized ``pandas_udf`` variant (Arrow path, proves the
    input_hint's "vectorized pandas UDF" contract and backs operators
    that are already inside an Arrow batch)
  * :data:`SQL_TOKENS_SPARK` / :data:`SQL_TOKENS_DUCKDB` — SQL
    fragments for oracle comparison.

Also contains the query-rewrite dictionary stage (the analog of the
reference's ES->COCO synonym table, client/src/utils/cocoData.ts /
searchProcessor.ts:9-13) as a broadcast-map lookup.
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The exact punctuation class the reference strips (searchProcessor.ts:5).
PUNCT_REGEX = r"[.,!?]"
SPLIT_REGEX = r"\s+"

_PUNCT_RE = re.compile(PUNCT_REGEX)
_SPLIT_RE = re.compile(SPLIT_REGEX)


def tokenize(text: str | None) -> list[str]:
    """Pure-Python canonical tokenizer (oracle + query-side)."""
    if not text:
        return []
    stripped = _PUNCT_RE.sub("", text.lower())
    return [t for t in _SPLIT_RE.split(stripped) if t]


_ARROW_SPLIT_REGEX = r"[ \t\n\x0B\f\r]+"
# Rows containing either of these characters take the per-row Python
# lowercasing path: they are the ONLY two non-locale entries in
# Unicode SpecialCasing.txt for LOWERCASE — U+0130 'İ' (expands to
# "i" + combining dot) and U+03A3 'Σ' (conditional final sigma 'ς') —
# where utf8proc's simple mapping (pyarrow) differs from the full
# mapping the JVM and CPython apply (verified empirically against
# Spark lower() for both).
_ARROW_LOWER_FALLBACK = re.compile("[İΣ]")


def tokenize_arrow(arr):
    """PyArrow-compute tokenizer (RE2 + utf8proc) — the fast Arrow path.

    Byte-identical to :func:`tokens_col` (the JVM build path): RE2 has
    no ``\\x0B`` in ``\\s`` and Java regex has no Unicode extension of
    it, so the split uses Java's exact ASCII whitespace class spelled
    out; lowercase divergences (İ, final sigma) fall back to Python
    per batch. Null text tokenizes to an empty list (the canonical
    Python semantics; the JVM column yields NULL, which every consumer
    treats identically).

    ~10x less CPU than the JVM regex expressions per token (RE2 +
    vectorized utf8proc vs java.util.regex) — the index build's event
    source, doc-stats and term-dict passes all ride this.

    Takes / returns ``pyarrow`` arrays: pass a ``StringArray`` or
    ``ChunkedArray``, get a ``ListArray`` of non-empty tokens.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(pc.cast(arr, pa.string()), "")
    low = pc.utf8_lower(arr)
    if pc.any(pc.match_substring_regex(arr, _ARROW_LOWER_FALLBACK.pattern)).as_py():
        low = pa.array([s.lower() for s in arr.to_pylist()], type=pa.string())
    stripped = pc.replace_substring_regex(low, PUNCT_REGEX, "")
    toks = pc.split_pattern_regex(stripped, _ARROW_SPLIT_REGEX)
    # drop the empty tokens split() emits at leading/trailing
    # whitespace, rebuilding the list offsets around the kept values
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    keep_np = keep.to_numpy(zero_copy_only=False)
    row_of = np.repeat(np.arange(len(counts)), counts)
    new_counts = np.bincount(row_of[keep_np], minlength=len(counts))
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), flat.filter(keep)
    )


def tokens_col(col: Column) -> Column:
    """Spark Column producing array<string> of tokens — JVM-side.

    filter() drops the empty strings that split() emits for leading /
    trailing whitespace, matching the pure-Python ``if t`` guard and
    the reference's ``.filter($"entity" =!= "")`` (README.md:375).
    """
    arr = F.split(F.regexp_replace(F.lower(col), PUNCT_REGEX, ""), SPLIT_REGEX)
    return F.filter(arr, lambda t: t != "")


def tokenize_series(s: pd.Series) -> pd.Series:
    """pandas implementation (one str per row in, list[str] per row out)."""
    stripped = s.fillna("").str.lower().str.replace(PUNCT_REGEX, "", regex=True)
    return stripped.str.split(SPLIT_REGEX).map(
        lambda toks: [t for t in toks if t] if isinstance(toks, list) else []
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_pandas_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer UDF (parity-tested against tokens_col)."""
    return tokenize_series(s)


def sql_tokens_spark(expr: str) -> str:
    """Spark SQL fragment: array<string> of tokens of ``expr``."""
    return (
        f"filter(split(regexp_replace(lower({expr}), '[.,!?]', ''), '\\\\s+'),"
        " t -> t != '')"
    )


def sql_tokens_duckdb(expr: str) -> str:
    """DuckDB SQL fragment: list of tokens of ``expr`` (same bytes)."""
    return (
        f"list_filter(string_split_regex(regexp_replace(lower({expr}), '[.,!?]', '', 'g'),"
        " '\\s+'), t -> t != '')"
    )


# ---------------------------------------------------------------------------
# Query rewrite: synonym dictionary (cocoData.ts analog)
# ---------------------------------------------------------------------------

def rewrite_terms(terms: Iterable[str], synonyms: Mapping[str, str]) -> list[str]:
    """Map terms through a synonym dictionary, drop unknowns' duplicates.

    Mirrors searchProcessor.ts:7-13: translate each token if the
    dictionary knows it, keep it otherwise, and dedup preserving first
    occurrence (the reference used a Set).
    """
    out: list[str] = []
    seen: set[str] = set()
    for t in terms:
        mapped = synonyms.get(t, t)
        if mapped not in seen:
            seen.add(mapped)
            out.append(mapped)
    return out


def rewrite_terms_col(terms: Column, synonyms: Mapping[str, str]) -> Column:
    """Spark-side synonym rewrite over an array<string> column.

    The dictionary is tiny (the reference's had ~100 entries), so it is
    inlined as a literal MAP into the plan — the declarative analog of
    a broadcast lookup, constant-folded by Catalyst.
    """
    if not synonyms:
        return F.array_distinct(terms)
    pairs: list[Column] = []
    for k, v in synonyms.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    return F.array_distinct(F.transform(terms, lambda t: F.coalesce(m[t], t)))
