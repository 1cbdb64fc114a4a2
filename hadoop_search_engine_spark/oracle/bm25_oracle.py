"""Single-node BM25 oracle — deliberately naive, trusted by inspection.

The reference repo has no scorer to compare against (its "ranking" is
posting order, /root/reference/server/src/services/search.service.js:
58-90), so this NumPy oracle *is* the reference implementation of the
BM25 engine's semantics: the distributed engine must be rank- AND
score-identical to it on the reference query set (BASELINE.md
correctness gate).

Determinism contract shared with the engine: float64 everywhere,
per-(term, doc) partials summed in ascending term order, ties broken
by doc_id ascending, same tokenizer bytes.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .. import BM25_B, BM25_K1
from ..functions.bm25 import idf as _idf
from ..functions.tokenizer import rewrite_terms, tokenize


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]], k1: float = BM25_K1, b: float = BM25_B):
        """docs: list of (doc_id, text)."""
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.positions: dict[tuple[str, int], list[int]] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            if not toks:
                continue
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
            for pos, term in enumerate(toks):
                self.positions.setdefault((term, doc_id), []).append(pos)
        self.n_docs = len(self.doc_len)
        self.avgdl = float(np.mean(list(self.doc_len.values()))) if self.doc_len else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score_one(self, term: str, doc_id: int) -> float:
        tf = float(self.postings[term][doc_id])
        dl = float(self.doc_len[doc_id])
        k1, b = self.k1, self.b
        partial = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
        return _idf(self.n_docs, self.df(term)) * partial

    def search(
        self,
        query_text: str,
        k: int = 10,
        synonyms: dict[str, str] | None = None,
        allowed: set[int] | None = None,
    ) -> list[tuple[int, float]]:
        """``allowed``: eligibility mask (filtered search) — statistics
        stay global; ineligible docs are dropped before the top-k cut."""
        terms = rewrite_terms(tokenize(query_text), synonyms or {})
        scores: dict[int, float] = {}
        for term in sorted(set(terms)):  # ascending term order (determinism)
            for doc_id in self.postings.get(term, {}):
                scores[doc_id] = scores.get(doc_id, 0.0) + self.score_one(term, doc_id)
        ranked = sorted(
            (
                kv for kv in scores.items()
                if allowed is None or kv[0] in allowed
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return ranked[:k]

    def phrase_search(
        self,
        phrase_text: str,
        k: int = 10,
        synonyms: dict[str, str] | None = None,
        slop: int = 0,
    ) -> list[tuple[int, float]]:
        """Exact-phrase top-k: terms at consecutive positions, ranked by
        the same per-term partials (ascending-term summation). With
        ``slop`` > 0, ordered proximity: each adjacent pair may be up
        to ``slop`` intervening tokens apart (per-gap window)."""
        syn = synonyms or {}
        seq = [syn.get(t, t) for t in tokenize(phrase_text)]
        if not seq:
            return []
        distinct = sorted(set(seq))
        if any(t not in self.postings for t in distinct):
            return []
        cand = set(self.postings[distinct[0]])
        for t in distinct[1:]:
            cand &= set(self.postings[t])
        matched = []
        for doc in cand:
            cur = set(self.positions[(seq[0], doc)])
            for t in seq[1:]:
                nxt = set(self.positions[(t, doc)])
                cur = {
                    p for p in nxt
                    if any(1 <= p - c <= slop + 1 for c in cur)
                }
                if not cur:
                    break
            if cur:
                matched.append(doc)
        scored = []
        for doc in matched:
            s = 0.0
            for t in distinct:  # ascending term order (determinism)
                s += self.score_one(t, doc)
            scored.append((doc, s))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]

    def boolean_search(
        self,
        query_text: str,
        k: int = 10,
        synonyms: dict[str, str] | None = None,
    ) -> list[tuple[int, float]]:
        """Ranked-boolean oracle (set algebra, trusted by inspection):
        eligibility = the AST evaluated over per-term doc-id SETS (NOT
        complements against the token-bearing universe), ranking = BM25
        over the positive leaves in ascending term order, score-0 docs
        excluded — the exact semantics of
        :func:`~..operators.boolean.search_topk_boolean`."""
        from ..operators.boolean import parse_boolean_query, query_terms

        ast = parse_boolean_query(query_text, synonyms)
        pos_terms, _neg = query_terms(ast)
        universe = set(self.doc_len)

        def ev(node) -> set[int]:
            kind = node[0]
            if kind == "term":
                return set(self.postings.get(node[1], {}))
            if kind == "not":
                return universe - ev(node[1])
            sets = [ev(c) for c in node[1]]
            acc = sets[0]
            for s in sets[1:]:
                acc = (acc & s) if kind == "and" else (acc | s)
            return acc

        eligible = ev(ast)
        scored = []
        for doc in eligible:
            s = 0.0
            hit = False
            for t in sorted(pos_terms):  # ascending term order
                if doc in self.postings.get(t, {}):
                    s += self.score_one(t, doc)
                    hit = True
            if hit:
                scored.append((doc, s))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]

    def or_union_first_seen(
        self,
        query_text: str,
        synonyms: dict[str, str] | None = None,
    ) -> list[tuple[int, str]]:
        """Reference-compat semantics (search.service.js:59-83):
        (doc_id, matched_term) in first-seen order, postings walked in
        doc_id order per term."""
        terms = rewrite_terms(tokenize(query_text), synonyms or {})
        seen: set[int] = set()
        out: list[tuple[int, str]] = []
        for term in terms:
            for doc_id in sorted(self.postings.get(term, {})):
                if doc_id not in seen:
                    seen.add(doc_id)
                    out.append((doc_id, term))
        return out
