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
