"""Lexicon-driven term expansion: prefix / fuzzy (bounded edit
distance, length-bucketed) / wildcard / regexp suggesters and the
searches built on them. Split from query_exec.py (round 4, file-size
hygiene); public names remain importable from
``operators.query_exec``."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import numpy as np
import pandas as pd

from .query_exec import (
    TOPK_SCHEMA,
    Index,
    _POP8,
    _empty_df,
    _lookup_terms,
    parse_query,
    search_topk,
)
from .index_build import term_frequencies


def suggest_terms(index: Index, prefix: str, k: int = 10) -> DataFrame:
    """Prefix autocomplete over the lexicon, ranked by document
    frequency (the search-box suggestion list). Driver-cached
    vocabularies answer without a Spark job (one linear pass over the
    pinned term map — ~ms at 2M terms); larger vocabularies run a
    pushed-down ``StartsWith`` filter + TakeOrderedAndProject over the
    vocab-sized lexicon table, never the postings."""
    p = prefix.strip().lower()
    spark = index.spark
    if not p:
        return _empty_df(spark, "term string, df long")
    lm = index.lexicon_map()
    if lm is not None:
        cands = [
            (t, int(v["df"])) for t, v in lm.items() if t.startswith(p)
        ]
        cands.sort(key=lambda e: (-e[1], e[0]))
        if not cands:
            return _empty_df(spark, "term string, df long")
        pdf = pd.DataFrame(cands[:k], columns=["term", "df"]).astype(
            {"term": "string", "df": "int64"}
        )
        return spark.createDataFrame(pdf)
    return (
        index.lexicon.where(F.col("term").startswith(p))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )

def suggest_terms_dataframe(docs: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Exhaustive corpus-scan variant of :func:`suggest_terms` — the
    DuckDB-oracle-comparable form (df recomputed from tokens)."""
    p = prefix.strip().lower()
    if not p:
        return _empty_df(docs.sparkSession, "term string, df long")
    tf = term_frequencies(docs)
    return (
        tf.where(F.col("term").startswith(p))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )

def _edit_distance(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein with early abort past ``cap`` (driver-side
    vocab scan only — executor-scale matching uses the JVM
    ``levenshtein`` expression)."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            if v < best:
                best = v
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]

def fuzzy_terms(index: Index, term: str, max_edits: int = 1, k: int = 5) -> DataFrame:
    """Spell-correction candidates: lexicon terms within ``max_edits``
    Levenshtein edits of ``term``, ranked (distance asc, df desc, term
    asc). Driver-cached vocabularies probe the length-bucketed pinned
    map (:meth:`Index.lexicon_by_length`): only the 2e+1 buckets with
    ``|len - len(term)| <= e`` are visited, a 64-bit character-mask
    popcount rules most candidates out before any DP, and the banded
    DP early-aborts past e — sub-ms at web vocabularies (BENCH.md)
    instead of a full-vocabulary Python scan. Larger vocabularies run
    the JVM ``levenshtein`` expression over the vocab-sized lexicon —
    never the postings or the corpus."""
    p = term.strip().lower()
    spark = index.spark
    if not p:
        return _empty_df(spark, "term string, dist int, df long")
    by_len = index.lexicon_by_length()
    if by_len is not None:
        pmask = 0
        for ch in p:
            pmask |= 1 << (ord(ch) & 63)
        cands = []
        for length in range(max(1, len(p) - max_edits), len(p) + max_edits + 1):
            bucket = by_len.get(length)
            if bucket is None:
                continue
            terms_b, dfs_b, masks_b = bucket
            xor = masks_b ^ np.uint64(pmask)
            pc = _POP8[xor.view(np.uint8)].reshape(-1, 8).sum(axis=1)
            for i in np.flatnonzero(pc <= 2 * max_edits):
                t = terms_b[i]
                d = _edit_distance(p, t, max_edits)
                if d <= max_edits:
                    cands.append((t, int(d), int(dfs_b[i])))
        cands.sort(key=lambda e: (e[1], -e[2], e[0]))
        if not cands:
            return _empty_df(spark, "term string, dist int, df long")
        pdf = pd.DataFrame(
            cands[:k], columns=["term", "dist", "df"]
        ).astype({"term": "string", "dist": "int32", "df": "int64"})
        return spark.createDataFrame(pdf)
    return (
        index.lexicon.withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(p))
        )
        .where(F.col("dist") <= max_edits)
        .select("term", F.col("dist").cast("int"), F.col("df").cast("long"))
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )

def fuzzy_terms_dataframe(
    docs: DataFrame, term: str, max_edits: int = 1, k: int = 5
) -> DataFrame:
    """Exhaustive corpus-scan variant of :func:`fuzzy_terms` — the
    DuckDB-oracle-comparable form (df recomputed from tokens, JVM
    ``levenshtein`` vs DuckDB ``levenshtein``)."""
    p = term.strip().lower()
    if not p:
        return _empty_df(docs.sparkSession, "term string, dist int, df long")
    tf = term_frequencies(docs)
    return (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(p)))
        .where(F.col("dist") <= max_edits)
        .select("term", F.col("dist").cast("int"), F.col("df").cast("long").alias("df"))
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )

def fuzzy_search_topk(
    index: Index,
    query_text: str,
    k: int = 10,
    max_edits: int = 1,
    synonyms: dict[str, str] | None = None,
    **search_kwargs,
) -> DataFrame:
    """Typo-tolerant search: query terms missing from the lexicon are
    replaced by their best spell-correction candidate (distance asc,
    df desc) before the normal :func:`search_topk`; in-vocabulary
    terms are never rewritten (the "did you mean" behavior). A term
    with no candidate within ``max_edits`` is dropped — matching
    search_topk's treatment of absent terms in ``or`` mode."""
    terms = parse_query(query_text, synonyms)
    if not terms:
        return _empty_df(index.spark, TOPK_SCHEMA)
    meta = _lookup_terms(index, terms)
    corrected: list[str] = []
    for t in terms:
        if t in meta:
            corrected.append(t)
            continue
        best = fuzzy_terms(index, t, max_edits=max_edits, k=1).collect()
        if best:
            corrected.append(best[0]["term"])
        elif search_kwargs.get("mode", "or") == "and":
            # conjunctive semantics: an uncorrectable term means no
            # doc can match — dropping it would silently relax the AND
            return _empty_df(index.spark, TOPK_SCHEMA)
    if not corrected:
        return _empty_df(index.spark, TOPK_SCHEMA)
    return search_topk(index, " ".join(corrected), k=k, **search_kwargs)

def expand_terms(
    index: Index, pattern: str, max_expansions: int = 50
) -> list[str]:
    """Expand a wildcard pattern (``*`` = any run, ``?`` = one char)
    against the LEXICON — never the postings or the corpus — returning
    at most ``max_expansions`` matching terms by (df desc, term asc),
    Lucene's MultiTermQuery rewrite cap. Driver-pinned vocabularies
    answer from the cached map with one compiled-regex pass; larger
    vocabularies run a SQL ``LIKE`` over the vocab-sized lexicon table
    (``*``/``?`` map 1:1 to ``%``/``_`` — tokens are ``[a-z0-9]+`` so
    no escaping collision). Pure-prefix patterns take the
    ``StartsWith`` pushdown path instead (:func:`prefix_search`)."""
    import re as _re

    p = pattern.strip().lower()
    if not p or p.strip("*") == "":
        return []
    # tokens are [a-z0-9]+: any other literal character (including SQL
    # LIKE metachars % / _) can match no term — return [] on BOTH
    # paths instead of letting the LIKE fallback mangle the pattern
    if any(not (c.isascii() and c.isalnum()) for c in p.replace("*", "").replace("?", "")):
        return []
    lm = index.lexicon_map()
    if lm is not None:
        rx = _re.compile(
            "^"
            + "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in p
            )
            + "$"
        )
        cands = [(t, int(v["df"])) for t, v in lm.items() if rx.match(t)]
        cands.sort(key=lambda e: (-e[1], e[0]))
        return [t for t, _df in cands[:max_expansions]]
    like = p.replace("*", "%").replace("?", "_")
    rows = (
        index.lexicon.where(F.col("term").like(like))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]

def wildcard_search(
    index: Index,
    pattern: str,
    k: int = 10,
    max_expansions: int = 50,
    **search_kwargs,
) -> DataFrame:
    """Wildcard query: expand the pattern against the lexicon
    (:func:`expand_terms`, capped at ``max_expansions`` by df), then
    run the standard disjunctive BM25 :func:`search_topk` over the
    expanded terms — a doc matching several expansions sums their
    contributions. Cost is bounded by ``max_expansions`` posting
    lists; the expansion itself is vocab-sized."""
    terms = expand_terms(index, pattern, max_expansions=max_expansions)
    if not terms:
        return _empty_df(index.spark, TOPK_SCHEMA)
    return search_topk(index, " ".join(terms), k=k, **search_kwargs)

def expand_terms_regexp(
    index: Index, pattern: str, max_expansions: int = 50
) -> list[str]:
    """Expand a REGULAR EXPRESSION against the LEXICON (Lucene/ES
    ``regexp`` query): the pattern is anchored to the whole term
    (ES semantics — ``sp.*k`` matches ``spark``, not ``sparks``'
    substring) and capped at ``max_expansions`` by (df desc, term
    asc), the MultiTermQuery rewrite order. Driver-pinned
    vocabularies answer with one compiled-regex pass over the cached
    map; larger vocabularies push an ``RLIKE`` filter + ordered limit
    over the vocab-sized lexicon table — never postings, never the
    corpus. Stick to the portable subset (literals, classes,
    alternation, ``* + ? {m,n}``) — terms are ``[a-z0-9]+`` so
    anything fancier can't match anyway."""
    import re as _re

    p = pattern.strip().lower()
    if not p:
        return []
    anchored = f"^(?:{p})$"
    lm = index.lexicon_map()
    if lm is not None:
        try:
            rx = _re.compile(anchored)
        except _re.error as exc:
            raise ValueError(f"bad regexp pattern {pattern!r}: {exc}") from exc
        cands = [(t, int(v["df"])) for t, v in lm.items() if rx.match(t)]
        cands.sort(key=lambda e: (-e[1], e[0]))
        return [t for t, _df in cands[:max_expansions]]
    rows = (
        index.lexicon.where(F.col("term").rlike(anchored))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_expansions)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]

def regexp_search(
    index: Index,
    pattern: str,
    k: int = 10,
    max_expansions: int = 50,
    **search_kwargs,
) -> DataFrame:
    """Regexp query (ES ``regexp``): expand the anchored pattern
    against the lexicon (:func:`expand_terms_regexp`, df-ranked cap),
    then standard disjunctive BM25 :func:`search_topk` over the
    expansions — cost bounded by ``max_expansions`` posting lists."""
    terms = expand_terms_regexp(index, pattern, max_expansions=max_expansions)
    if not terms:
        return _empty_df(index.spark, TOPK_SCHEMA)
    return search_topk(index, " ".join(terms), k=k, **search_kwargs)

def prefix_search(
    index: Index,
    prefix: str,
    k: int = 10,
    max_expansions: int = 50,
    **search_kwargs,
) -> DataFrame:
    """Prefix query (``prefix*``): expansion rides
    :func:`suggest_terms`' df-ranked prefix probe (pinned-map linear
    pass, or a pushed-down ``StartsWith`` lexicon filter — cheaper
    than the generic wildcard regex), then the standard disjunctive
    :func:`search_topk` over the expansions."""
    p = prefix.strip().lower().rstrip("*")
    if not p:
        return _empty_df(index.spark, TOPK_SCHEMA)
    rows = suggest_terms(index, p, k=max_expansions).collect()
    if not rows:
        return _empty_df(index.spark, TOPK_SCHEMA)
    return search_topk(
        index, " ".join(r["term"] for r in rows), k=k, **search_kwargs
    )
