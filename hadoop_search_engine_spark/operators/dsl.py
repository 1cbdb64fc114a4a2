"""Elasticsearch-style JSON query DSL over the block index.

The migration surface: an ES user speaks `{"query": {...}, "aggs":
{...}}`, and every clause here compiles onto an EXISTING exact engine
path — the DSL layer adds zero scoring code, so every result is
covered by the per-operator oracles and tests. The reference engine's
entire query surface is a comma-separated term list
(server/src/controllers/search.controller.js); this is the structured
query language a real search deployment migrates with.

Supported top-level body keys:

  query          required; one clause object (below)
  size           top-k (default 10)
  search_after   [doc_id, score] cursor (exact pagination)
  similarity     "bm25" | "lm_dirichlet" | "tfidf" | "boolean"
                 (operators/ranking.py; match/query_string/term(s))
  aggs           {name: {kind: {...}}} over the query's FULL hit set
                 (match-family queries; see _AGG_KINDS)
  fields         metadata columns joined onto the hit page
  track_total_hits  exact full hit count -> DslResult.total
  min_score      drop page hits scoring below the threshold
  explain        per-hit per-term Explanation -> DslResult.explain
                 (materializes the k-row page; the one eager key)

Query clauses → engine paths:

  match                → query_exec.search_topk (operator/or|and,
                         minimum_should_match, boost via ^ syntax)
  query_string         → search_topk (full ^boost query syntax)
  term / terms         → search_topk on the literal token(s) (NOTE:
                         analyzed like every query — this engine has
                         no unanalyzed keyword field)
  match_phrase         → phrase_search (slop)
  match_phrase_prefix  → phrase_prefix_search (max_expansions)
  prefix / wildcard    → prefix_search / wildcard_search
  fuzzy                → fuzzy_search_topk (fuzziness = max_edits)
  multi_match          → multifield.multi_match ("fields": ["title^3",
                         "body"], type most_fields|best_fields|
                         cross_fields, tie_breaker) — needs
                         `multifield=`
  bool                 → boolean.search_topk_boolean; must=AND,
                         must_not=NOT, should compiles to an OR group
                         (required when there is no must or when
                         minimum_should_match=1; with a must present
                         and no minimum_should_match it becomes the
                         ES score-only boost: ORing the should terms
                         with one must leaf leaves eligibility
                         unchanged while the leaves join the positive
                         scoring set). filter clauses (term/range on
                         METADATA columns, non-scoring) compile to the
                         cogroup eligibility page and compose with the
                         match family; term-structured bools compose
                         via search_topk_boolean(doc_filter=) — the
                         full eligible set is scored, then filtered.
  function_score       → hybrid.function_score ({"query": ...,
                         "gauss"/"exp"/"linear"/"field_value_factor",
                         "boost_mode"}) — needs `documents=`
  match_all            → every live doc at constant score ("boost",
                         default 1.0), _doc (doc_id) order — the
                         browse/export query; composes with filters
  ids                  → {"values": [...]} at constant score (live
                         ids only — tombstones excluded like every
                         other path)
  exists               → {"field": f}: docs whose METADATA column is
                         non-null, constant score — needs
                         `documents=`

Results come back as :class:`DslResult` — ``hits`` (the standard
(doc_id, score) frame, plus period/segment columns where the
underlying path adds them) and ``aggs`` (name → DataFrame). Nothing
here collects or loops driver-side: compilation is pure metadata, and
execution is whatever plan the underlying operator already makes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from .query_exec import (
    Index,
    matched_docs,
    search_topk,
)

_TOKEN_OK = re.compile(r"^\S+$")


@dataclass
class DslResult:
    hits: DataFrame | None
    aggs: dict[str, DataFrame] = field(default_factory=dict)
    suggest: dict[str, DataFrame] = field(default_factory=dict)
    # collapse inner_hits: {name: (key, rank, doc_id, score) frame}
    inner_hits: dict[str, DataFrame] = field(default_factory=dict)
    # track_total_hits: 1-row (n_hits) frame, None unless requested
    total: DataFrame | None = None
    # explain=true: (doc_id, term, tf, df, idf, contribution) rows
    explain: DataFrame | None = None


class DslError(ValueError):
    pass


def _one_key(obj: dict, what: str) -> tuple[str, object]:
    if not isinstance(obj, dict) or len(obj) != 1:
        raise DslError(f"{what} must be a single-key object, got {obj!r}")
    return next(iter(obj.items()))


def _field_body(clause, what: str) -> tuple[str, dict]:
    """ES field-keyed clause: {"<field>": "shorthand"} or
    {"<field>": {...params}} → (field, params-with-query)."""
    fld, body = _one_key(clause, what)
    if not isinstance(body, dict):
        body = {"query": body} if what != "term" else {"value": body}
    return fld, body


def _require_text_field(fld: str, what: str) -> None:
    if fld != "text":
        raise DslError(
            f"{what} targets field {fld!r}; the single-field index has "
            "one indexed field, 'text' (use multi_match for multi-field "
            "indexes, or term/range filters inside bool.filter for "
            "metadata columns)"
        )


def _parse_boosted_fields(fields: list[str]) -> dict[str, float]:
    out = {}
    for f_ in fields:
        if "^" in f_:
            name, w = f_.split("^", 1)
            out[name] = float(w)
        else:
            out[f_] = 1.0
    return out


# --------------------------------------------------------- bool query


def _leaf_expr(clause: dict) -> str:
    """A bool-context leaf → boolean mini-language fragment."""
    kind, body = _one_key(clause, "bool clause")
    if kind == "term":
        fld, b = _field_body(body, "term")
        _require_text_field(fld, "term")
        v = str(b["value"]).strip()
        if not _TOKEN_OK.match(v):
            raise DslError(f"term value must be a single token, got {v!r}")
        return v
    if kind == "match":
        fld, b = _field_body(body, "match")
        _require_text_field(fld, "match")
        toks = str(b["query"]).split()
        op = " AND " if b.get("operator", "or") == "and" else " OR "
        if not toks:
            raise DslError("empty match query in bool context")
        return "(" + op.join(toks) + ")" if len(toks) > 1 else toks[0]
    if kind == "bool":
        return "(" + _bool_expr(body) + ")"
    raise DslError(
        f"unsupported clause {kind!r} inside bool (term/match/bool only)"
    )


def _bool_expr(body: dict) -> str:
    must = [_leaf_expr(c) for c in body.get("must", [])]
    must_not = [_leaf_expr(c) for c in body.get("must_not", [])]
    should = body.get("should", [])
    msm = body.get("minimum_should_match")
    parts = list(must)
    if should:
        exprs = [_leaf_expr(c) for c in should]
        if msm not in (None, 0, 1):
            raise DslError(
                "bool.minimum_should_match > 1 is not supported "
                "(use a match clause with minimum_should_match)"
            )
        if must and msm is None:
            # ES: should with a must present is score-only. ORing the
            # should leaves with one must leaf keeps eligibility
            # identical (the must leaf is true for every eligible doc)
            # while the should terms join the positive scoring set.
            parts.append("(" + " OR ".join(exprs + [must[0]]) + ")")
        else:
            parts.append("(" + " OR ".join(exprs) + ")")
    if not parts:
        raise DslError("bool needs at least one must/should clause")
    expr = " AND ".join(parts)
    for n in must_not:
        expr += f" NOT {n}"
    return expr


# ----------------------------------------------------- runtime mappings


def _compile_runtime_script(
    source: str,
    columns: list[str],
    extra: dict | None = None,
    wrap_emit: bool = True,
) -> "F.Column":
    """Compile the ES runtime-field painless subset —
    ``emit(<arithmetic over doc['field'].value>)`` — into a Spark
    Column via the Python ast (the same no-eval discipline as
    analytics._compile_bucket_script). Allowed inside ``emit``:
    ``doc['name'].value`` references (name must be a document or
    earlier runtime column), numeric literals, ``+ - * /``, unary
    minus, comparisons, ``and``/``or`` and parentheses; ``extra``
    binds bare names (``_score`` in script_score). Anything else is
    rejected loudly — scripts are user input. ``wrap_emit=False``
    accepts a bare expression (ES script_score style) instead of the
    runtime-field ``emit(...)`` wrapper."""
    import ast

    extra = extra or {}

    def comp(node):
        if isinstance(node, ast.Constant) and isinstance(
                node.value, (int, float)) and not isinstance(node.value, bool):
            return F.lit(float(node.value))
        if isinstance(node, ast.Name) and node.id in extra:
            return extra[node.id]
        if isinstance(node, ast.Attribute) and node.attr == "value":
            sub = node.value
            if (
                isinstance(sub, ast.Subscript)
                and isinstance(sub.value, ast.Name)
                and sub.value.id == "doc"
                and isinstance(sub.slice, ast.Constant)
                and isinstance(sub.slice.value, str)
            ):
                name = sub.slice.value
                if name not in columns:
                    raise DslError(
                        f"runtime script references doc[{name!r}] which is "
                        f"not a document column"
                    )
                return F.col(name).cast("double")
            raise DslError(
                "only doc['<column>'].value references are allowed in "
                "runtime scripts"
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -comp(node.operand)
        if isinstance(node, ast.BinOp):
            lhs, rhs = comp(node.left), comp(node.right)
            if isinstance(node.op, ast.Add):
                return lhs + rhs
            if isinstance(node.op, ast.Sub):
                return lhs - rhs
            if isinstance(node.op, ast.Mult):
                return lhs * rhs
            if isinstance(node.op, ast.Div):
                return lhs / rhs
            raise DslError(f"runtime script operator {node.op!r} not allowed")
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise DslError("chained comparisons not allowed")
            lhs, rhs = comp(node.left), comp(node.comparators[0])
            op = node.ops[0]
            table = {
                ast.Gt: lambda: lhs > rhs, ast.GtE: lambda: lhs >= rhs,
                ast.Lt: lambda: lhs < rhs, ast.LtE: lambda: lhs <= rhs,
                ast.Eq: lambda: lhs == rhs, ast.NotEq: lambda: lhs != rhs,
            }
            for kind, make in table.items():
                if isinstance(op, kind):
                    return make()
            raise DslError(f"comparison {op!r} not allowed")
        if isinstance(node, ast.BoolOp):
            parts = [comp(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        raise DslError(
            f"unsupported runtime script construct {type(node).__name__}"
        )

    try:
        tree = ast.parse(source.strip(), mode="eval")
    except SyntaxError as exc:
        raise DslError(f"bad runtime script {source!r}: {exc}") from exc
    if not wrap_emit:
        return comp(tree.body)
    call = tree.body
    if not (
        isinstance(call, ast.Call)
        and isinstance(call.func, ast.Name)
        and call.func.id == "emit"
        and len(call.args) == 1
        and not call.keywords
    ):
        raise DslError("runtime script must be emit(<expression>)")
    return comp(call.args[0])


_RUNTIME_TYPES = {"double": "double", "long": "long", "boolean": "boolean"}


def _apply_runtime_mappings(
    mappings: dict, documents: DataFrame | None
) -> DataFrame:
    """ES ``runtime_mappings``: derive script-defined columns on the
    metadata table BEFORE any filter/agg/sort runs, so runtime fields
    are usable everywhere a mapped field is. Pure Column arithmetic —
    Catalyst folds it into the scan; nothing is materialized. Later
    mappings may reference earlier ones (ES allows runtime-on-runtime
    lookups), hence the sequential withColumn fold."""
    if documents is None:
        raise DslError("runtime_mappings needs documents= (the metadata table)")
    out = documents
    for name, spec in mappings.items():
        if not isinstance(spec, dict) or "type" not in spec:
            raise DslError(f"runtime_mappings.{name} needs a type")
        typ = _RUNTIME_TYPES.get(spec["type"])
        if typ is None:
            raise DslError(
                f"runtime_mappings.{name}: type must be one of "
                f"{sorted(_RUNTIME_TYPES)}, got {spec['type']!r}"
            )
        source = (spec.get("script") or {}).get("source")
        if not source:
            raise DslError(f"runtime_mappings.{name} needs script.source")
        col = _compile_runtime_script(source, out.columns)
        out = out.withColumn(name, col.cast(typ))
    return out


# ----------------------------------------------------- metadata filter


def _metadata_filter(filters: list, documents: DataFrame | None) -> DataFrame:
    """ES bool.filter (non-scoring, required) on METADATA columns →
    the doc_id eligibility frame search_topk's cogroup page consumes.
    Column-pruned: only doc_id survives the projection."""
    if documents is None:
        raise DslError("bool.filter needs documents= (the metadata table)")
    out = documents
    for c in filters:
        kind, body = _one_key(c, "filter clause")
        if kind == "term":
            fld, b = _field_body(body, "term")
            out = out.where(F.col(fld) == F.lit(b["value"]))
        elif kind == "terms":
            fld, vals = _one_key(body, "terms filter")
            if not isinstance(vals, (list, tuple)) or not vals:
                raise DslError("terms filter needs a non-empty value list")
            out = out.where(F.col(fld).isin(list(vals)))
        elif kind == "exists":
            fld = body.get("field")
            if not fld:
                raise DslError("exists filter needs field")
            out = out.where(F.col(fld).isNotNull())
        elif kind == "range":
            fld, b = _one_key(body, "range")
            col = F.col(fld)
            for op, v in b.items():
                if op == "gte":
                    out = out.where(col >= F.lit(v))
                elif op == "gt":
                    out = out.where(col > F.lit(v))
                elif op == "lte":
                    out = out.where(col <= F.lit(v))
                elif op == "lt":
                    out = out.where(col < F.lit(v))
                else:
                    raise DslError(f"unknown range operator {op!r}")
        else:
            raise DslError(
                f"unsupported filter clause {kind!r} "
                "(term/terms/exists/range)"
            )
    return out.select("doc_id")


# ------------------------------------------------------------- compile


def _match_args(b: dict) -> dict:
    return {
        "mode": "and" if b.get("operator", "or") == "and" else "or",
        "min_should_match": b.get("minimum_should_match"),
    }


def _compile(
    q: dict,
    index: Index,
    k: int,
    after,
    similarity,
    synonyms,
    documents: DataFrame | None,
    multifield,
    doc_filter: DataFrame | None,
) -> DataFrame:
    kind, body = _one_key(q, "query")

    def _no_filter(what):
        if doc_filter is not None:
            raise DslError(
                f"bool.filter does not compose with {what} yet "
                "(match/query_string/term/terms only)"
            )

    if kind in ("match", "term", "terms"):
        if kind == "match":
            fld, b = _field_body(body, "match")
            _require_text_field(fld, "match")
            text, extra = str(b["query"]), _match_args(b)
        elif kind == "term":
            fld, b = _field_body(body, "term")
            _require_text_field(fld, "term")
            text, extra = str(b["value"]), {}
        else:
            fld, vals = _one_key(body, "terms")
            _require_text_field(fld, "terms")
            text, extra = " ".join(str(v) for v in vals), {}
        return search_topk(index, text, k=k, synonyms=synonyms,
                           similarity=similarity, after=after,
                           doc_filter=doc_filter, **extra)
    if kind == "query_string":
        return search_topk(index, str(body["query"]), k=k,
                           synonyms=synonyms, similarity=similarity,
                           after=after, doc_filter=doc_filter)

    if similarity is not None:
        raise DslError(
            f"similarity composes with the match family only, not {kind!r}"
        )

    if kind == "match_phrase":
        from .query_exec import phrase_search

        _no_filter(kind)
        fld, b = _field_body(body, "match_phrase")
        _require_text_field(fld, "match_phrase")
        return phrase_search(index, str(b["query"]), k=k, synonyms=synonyms,
                             slop=int(b.get("slop", 0)), after=after)
    if kind == "match_phrase_prefix":
        from .query_exec import phrase_prefix_search

        _no_filter(kind)
        fld, b = _field_body(body, "match_phrase_prefix")
        _require_text_field(fld, "match_phrase_prefix")
        return phrase_prefix_search(
            index, str(b["query"]), k=k, synonyms=synonyms,
            max_expansions=int(b.get("max_expansions", 50)),
            slop=int(b.get("slop", 0)), after=after,
        )
    if kind == "terms_set":
        _no_filter(kind)
        fld, b = _field_body(body, "terms_set")
        _require_text_field(fld, "terms_set")
        terms = b.get("terms")
        if not isinstance(terms, list) or not terms:
            raise DslError("terms_set needs a non-empty terms list")
        msm = b.get("minimum_should_match")
        if msm is None:
            raise DslError(
                "terms_set needs minimum_should_match (the field/script "
                "variants are not supported)"
            )
        return search_topk(
            index, " ".join(str(t) for t in terms), k=k, synonyms=synonyms,
            min_should_match=int(msm), after=after,
        )
    if kind == "intervals":
        # the Lucene intervals `match` rule mapped onto the exact
        # positional engines: ordered -> phrase slop, unordered ->
        # the within-window span (near_search); other interval rules
        # (all_of/any_of/fuzzy/prefix) are not supported
        from .query_exec import near_search, parse_query, phrase_search

        _no_filter(kind)
        fld, b = _field_body(body, "intervals")
        _require_text_field(fld, "intervals")
        if set(b) != {"match"}:
            raise DslError("intervals supports the match rule only")
        mb = b["match"]
        text = str(mb["query"])
        gaps = int(mb.get("max_gaps", -1))
        if gaps < 0:
            raise DslError("intervals.match needs max_gaps >= 0")
        if after is not None:
            raise DslError("search_after does not compose with intervals")
        if bool(mb.get("ordered", False)):
            return phrase_search(index, text, k=k, synonyms=synonyms,
                                 slop=gaps)
        n_terms = len(parse_query(text, synonyms, index.token_fn()))
        return near_search(index, text, window=n_terms + gaps, k=k,
                           synonyms=synonyms)
    if kind == "match_bool_prefix":
        # ES match_bool_prefix: bool-should over the fixed terms plus
        # every lexicon expansion of the LAST term as its own scored
        # term (non-positional — contrast match_phrase_prefix)
        from .query_exec import parse_query, suggest_terms

        _no_filter(kind)
        fld, b = _field_body(body, "match_bool_prefix")
        _require_text_field(fld, "match_bool_prefix")
        toks = parse_query(str(b["query"]), synonyms, index.token_fn())
        if not toks:
            return search_topk(index, "", k=k)
        exp = [
            r["term"]
            for r in suggest_terms(
                index, toks[-1], k=int(b.get("max_expansions", 50))
            ).collect()
        ]
        # pass the PRE-ANALYZED term list (parse_query list form):
        # toks and exp are already in lexicon surface form; re-joining
        # into text would re-apply the index analyzer, and porter
        # stemming is not idempotent ('degre' -> 'degr'), silently
        # matching nothing on stemmed indexes
        allt = toks[:-1] + (exp or [toks[-1]])
        return search_topk(index, allt, k=k, after=after)
    if kind == "script_score":
        from .query_exec import scored_docs

        _no_filter(kind)
        if documents is None:
            raise DslError("script_score needs documents= "
                           "(the metadata table)")
        if after is not None:
            raise DslError("search_after does not compose with "
                           "script_score")
        inner = body.get("query")
        ik, ib = _one_key(inner, "script_score.query")
        if ik not in ("match", "query_string", "term", "terms"):
            raise DslError(
                "script_score.query must be match/query_string/term/"
                f"terms, got {ik!r}"
            )
        if ik == "match":
            f2, b2 = _field_body(ib, "match")
            _require_text_field(f2, "match")
            text = str(b2["query"])
            mode = "and" if b2.get("operator", "or") == "and" else "or"
        elif ik == "query_string":
            text, mode = str(ib["query"]), "or"
        elif ik == "term":
            f2, b2 = _field_body(ib, "term")
            text, mode = str(b2["value"]), "or"
        else:
            f2, vals = _one_key(ib, "terms")
            text, mode = " ".join(str(v) for v in vals), "or"
        source = (body.get("script") or {}).get("source")
        if not source:
            raise DslError("script_score needs script.source")
        expr = _compile_runtime_script(
            source, documents.columns,
            extra={"_score": F.col("score").cast("double")},
            wrap_emit=False,
        )
        full = scored_docs(index, text, mode=mode, synonyms=synonyms)
        return (
            documents.join(full, "doc_id")
            .select("doc_id", expr.cast("double").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(int(k))
        )
    if kind == "prefix":
        from .query_exec import prefix_search

        _no_filter(kind)
        fld, b = _field_body(body, "prefix")
        _require_text_field(fld, "prefix")
        return prefix_search(index, str(b.get("value", b.get("query"))),
                             k=k, after=after)
    if kind == "wildcard":
        from .query_exec import wildcard_search

        _no_filter(kind)
        fld, b = _field_body(body, "wildcard")
        _require_text_field(fld, "wildcard")
        return wildcard_search(index, str(b.get("value", b.get("query"))),
                               k=k, after=after)
    if kind == "regexp":
        from .query_exec import regexp_search

        _no_filter(kind)
        fld, b = _field_body(body, "regexp")
        _require_text_field(fld, "regexp")
        return regexp_search(
            index, str(b.get("value", b.get("query"))), k=k,
            max_expansions=int(b.get("max_expansions", 50)), after=after,
        )
    if kind == "pinned":
        from .query_exec import pinned_search

        _no_filter(kind)
        if after is not None:
            raise DslError("search_after does not compose with 'pinned'")
        ids = body.get("ids")
        if not isinstance(ids, list) or not ids:
            raise DslError("pinned needs a non-empty ids list")
        t, m = _match_family_text(body.get("organic"), "pinned.organic")
        return pinned_search(index, [int(d) for d in ids], t, k=k,
                             synonyms=synonyms, mode=m)
    if kind == "fuzzy":
        from .query_exec import fuzzy_search_topk

        _no_filter(kind)
        fld, b = _field_body(body, "fuzzy")
        _require_text_field(fld, "fuzzy")
        return fuzzy_search_topk(
            index, str(b.get("value", b.get("query"))), k=k,
            max_edits=int(b.get("fuzziness", 1)), after=after,
        )
    if kind in ("multi_match", "bool", "function_score") and after is not None:
        raise DslError(f"search_after does not compose with {kind!r} yet")
    if kind == "combined_fields":
        from .multifield import combined_fields_topk

        _no_filter(kind)
        if after is not None:
            raise DslError(
                "search_after does not compose with 'combined_fields'"
            )
        if documents is None:
            raise DslError(
                "combined_fields needs documents= (the table carrying "
                "the listed field columns)"
            )
        bst = _parse_boosted_fields(body.get("fields", []))
        if not bst:
            raise DslError("combined_fields needs a fields list")
        missing = [f_ for f_ in bst if f_ not in documents.columns]
        if missing:
            raise DslError(
                f"combined_fields fields {missing} not on documents="
            )
        return combined_fields_topk(
            documents, str(body["query"]),
            {f_: f_ for f_ in bst}, boosts=bst, k=k, synonyms=synonyms,
        )
    if kind == "multi_match":
        from .multifield import multi_match

        _no_filter(kind)
        if multifield is None:
            raise DslError("multi_match needs multifield= "
                           "(a MultiFieldIndex)")
        combine = body.get("type", "most_fields")
        if combine not in ("most_fields", "best_fields", "cross_fields"):
            raise DslError(f"multi_match type {combine!r} unsupported")
        return multi_match(
            multifield, str(body["query"]), k=k,
            boosts=_parse_boosted_fields(body.get(
                "fields", sorted(multifield.fields))),
            combine=combine,
            tie_breaker=float(body.get("tie_breaker", 0.0)),
            mode="and" if body.get("operator", "or") == "and" else "or",
            synonyms=synonyms,
        )
    if kind == "bool":
        from .boolean import search_topk_boolean

        # metadata filters split out; the rest compiles to the boolean
        # mini-language. A PURE filter+match bool routes through
        # search_topk's eligibility page instead.
        flt = body.get("filter", [])
        rest = {kk: vv for kk, vv in body.items() if kk != "filter"}
        if flt:
            f_frame = _metadata_filter(flt, documents)
            merged = (
                f_frame if doc_filter is None
                else doc_filter.join(f_frame, "doc_id", "left_semi")
            )
            only_match = (
                len(rest.get("must", [])) == 1
                and not rest.get("should")
                and not rest.get("must_not")
            )
            if only_match:
                return _compile(rest["must"][0], index, k, after,
                                similarity, synonyms, documents,
                                multifield, merged)
            # term-structured bool + metadata filter: the boolean
            # engine scores the FULL eligible set (per-shard cut
            # disabled — exactness under the filter) and the metadata
            # frame applies as a semi-join before the top-k
            return search_topk_boolean(index, _bool_expr(rest), k=k,
                                       synonyms=synonyms,
                                       doc_filter=merged)
        return search_topk_boolean(index, _bool_expr(rest), k=k,
                                   synonyms=synonyms,
                                   doc_filter=doc_filter)
    if kind == "function_score":
        from .hybrid import function_score

        _no_filter(kind)
        if documents is None:
            raise DslError("function_score needs documents= "
                           "(the metadata table)")
        inner = body.get("query")
        ik, ib = _one_key(inner, "function_score.query")
        if ik not in ("match", "query_string", "term", "terms"):
            raise DslError(
                "function_score.query must be match/query_string/"
                f"term/terms, got {ik!r}"
            )
        if ik == "match":
            fld, b = _field_body(ib, "match")
            _require_text_field(fld, "match")
            text = str(b["query"])
            mode = "and" if b.get("operator", "or") == "and" else "or"
        elif ik == "query_string":
            text, mode = str(ib["query"]), "or"
        elif ik == "term":
            fld, b = _field_body(ib, "term")
            text, mode = str(b["value"]), "or"
        else:
            fld, vals = _one_key(ib, "terms")
            text, mode = " ".join(str(v) for v in vals), "or"
        decay = None
        for dk in ("gauss", "exp", "linear"):
            if dk in body:
                fld2, params = _one_key(body[dk], dk)
                decay = {"kind": dk, "field": fld2, **params}
        return function_score(
            index, text, documents, k=k, decay=decay,
            field_value_factor=body.get("field_value_factor"),
            random_score=body.get("random_score"),
            boost_mode=body.get("boost_mode", "multiply"),
            mode=mode, synonyms=synonyms,
        )
    if kind in ("match_all", "ids", "exists"):
        # constant-score metadata leaves: eligibility comes from the
        # index's own doc_stats (live docs = doc_stats minus the
        # tombstone table, anti-joined DISTRIBUTED — never a driver
        # set), optionally narrowed by bool.filter's eligibility page
        # and, for exists, the metadata table. Ordering is ES's _doc
        # tiebreak (doc_id asc); cost is one pruned doc_stats scan.
        if after is not None:
            raise DslError(f"{kind} does not support search_after")
        import os as _os

        live = index.doc_stats.select("doc_id")
        tomb_dir = _os.path.join(index.out_dir, "tombstones")
        if _os.path.isdir(tomb_dir):
            live = live.join(
                index.spark.read.parquet(tomb_dir).select("doc_id"),
                "doc_id",
                "left_anti",
            )
        if doc_filter is not None:
            live = live.join(doc_filter.select("doc_id"), "doc_id",
                             "left_semi")
        if kind == "ids":
            vals = [int(v) for v in body.get("values", [])]
            if not vals:
                raise DslError("ids needs values")
            live = live.where(F.col("doc_id").isin(vals))
        elif kind == "exists":
            fld = body.get("field")
            if not fld:
                raise DslError("exists needs field")
            if fld == "text":
                pass  # every indexed doc has text by construction
            else:
                if documents is None:
                    raise DslError("exists needs documents= "
                                   "(the metadata table)")
                live = live.join(
                    documents.where(F.col(fld).isNotNull())
                    .select("doc_id"),
                    "doc_id",
                    "left_semi",
                )
        boost = float(body.get("boost", 1.0)) if kind == "match_all" else 1.0
        return (
            live.orderBy("doc_id")
            .limit(k)
            .select("doc_id", F.lit(boost).alias("score"))
        )

    if kind == "rank_feature":
        # ES rank_feature (additive saturating feature fusion). ES
        # nests this inside bool.should beside the text query; here
        # the clause carries its text query as a "query" sibling —
        # same semantics, flat shape: {"field": f, "saturation":
        # {"pivot": p}, "boost": b, "query": <match-family>}.
        from .hybrid import rank_feature_topk

        _no_filter(kind)
        if after is not None:
            raise DslError("search_after does not compose with "
                           "rank_feature yet")
        if documents is None:
            raise DslError("rank_feature needs documents= "
                           "(the metadata table)")
        fld = body.get("field")
        inner = body.get("query")
        if not fld or inner is None:
            raise DslError("rank_feature needs field and query")
        text, mode = _match_family_text(inner, "rank_feature.query")
        kwargs: dict = {}
        if "saturation" in body:
            kwargs = {"fn": "saturation",
                      "pivot": float(body["saturation"]["pivot"])}
        elif "log" in body:
            kwargs = {"fn": "log",
                      "scaling": float(body["log"].get(
                          "scaling_factor", 1.0))}
        elif "sigmoid" in body:
            kwargs = {"fn": "sigmoid",
                      "pivot": float(body["sigmoid"]["pivot"]),
                      "exponent": float(body["sigmoid"].get(
                          "exponent", 1.0))}
        else:
            raise DslError(
                "rank_feature needs saturation/log/sigmoid "
                "(saturation requires an explicit pivot — the ES "
                "default pivot is sketch-derived and nondeterministic)"
            )
        return rank_feature_topk(
            index, text, documents, fld, k=k, mode=mode,
            synonyms=synonyms, boost=float(body.get("boost", 1.0)),
            **kwargs,
        )
    if kind == "simple_query_string":
        # ES simple_query_string, strict documented subset: a whole
        # quoted phrase ("..."~N → match_phrase slop), -token
        # negation (must_not), remaining tokens joined by
        # default_operator. Each form compiles to an existing exact
        # path (phrase_search / boolean engine / search_topk); the
        # |, +, *, ~ infix operators are out of subset — use bool /
        # match_phrase_prefix / fuzzy directly.
        _no_filter(kind)
        text = str(body.get("query", "")).strip()
        if not text:
            raise DslError("simple_query_string needs query")
        default_op = body.get("default_operator", "or").lower()
        if default_op not in ("or", "and"):
            raise DslError(f"unknown default_operator {default_op!r}")
        flds = body.get("fields", ["text"])
        if flds != ["text"]:
            raise DslError(
                "simple_query_string targets the 'text' field (use "
                "multi_match for multi-field indexes)"
            )
        m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', text)
        if m:
            from .query_exec import phrase_search

            return phrase_search(index, m.group(1), k=k,
                                 synonyms=synonyms,
                                 slop=int(m.group(2) or 0), after=after)
        if any(ch in text for ch in '"|+~*()'):
            raise DslError(
                "simple_query_string subset: whole-quoted phrase or "
                "space-separated tokens with -negation only"
            )
        toks = text.split()
        neg = [t[1:] for t in toks if t.startswith("-") and len(t) > 1]
        pos = [t for t in toks if not t.startswith("-")]
        if not pos:
            raise DslError(
                "simple_query_string needs at least one positive token"
            )
        if not neg:
            return search_topk(
                index, " ".join(pos), k=k, synonyms=synonyms,
                mode=default_op, after=after, doc_filter=doc_filter,
            )
        from .boolean import search_topk_boolean

        if after is not None:
            raise DslError(
                "search_after does not compose with negation yet"
            )
        op = " AND " if default_op == "and" else " OR "
        expr = "(" + op.join(pos) + ")" if len(pos) > 1 else pos[0]
        for n in neg:
            expr += f" NOT {n}"
        return search_topk_boolean(index, expr, k=k, synonyms=synonyms,
                                   doc_filter=doc_filter)
    if kind == "span_first":
        # ES span_first: the (ordered) span must END within the first
        # `end` tokens of the document. Inner span subset: span_term
        # (single token) or match_phrase (our ordered-span sugar).
        from .query_exec import phrase_search

        _no_filter(kind)
        inner = body.get("match")
        end = body.get("end")
        if inner is None or end is None:
            raise DslError("span_first needs match and end")
        ik, ib = _one_key(inner, "span_first.match")
        if ik == "span_term":
            fld, b = _field_body(ib, "term")
            _require_text_field(fld, "span_term")
            text, slop = str(b["value"]), 0
        elif ik == "match_phrase":
            fld, b = _field_body(ib, "match_phrase")
            _require_text_field(fld, "match_phrase")
            text, slop = str(b["query"]), int(b.get("slop", 0))
        else:
            raise DslError(
                f"span_first.match must be span_term or match_phrase, "
                f"got {ik!r}"
            )
        return phrase_search(index, text, k=k, synonyms=synonyms,
                             slop=slop, first_end=int(end), after=after)
    if kind == "more_like_this":
        # ES MLT: the source doc's top tf*idf terms become a standard
        # disjunctive query, the source excluded. `like` subset: one
        # {"_id": n} entry (docs-as-text not supported — supply text
        # through a match query instead).
        from .query_exec import more_like_this

        if after is not None:
            raise DslError(
                "search_after does not compose with more_like_this yet"
            )
        _no_filter(kind)
        if documents is None:
            raise DslError("more_like_this needs documents= "
                           "(the metadata table)")
        like = body.get("like")
        if isinstance(like, dict):
            like = [like]
        if (not isinstance(like, list) or len(like) != 1
                or not isinstance(like[0], dict) or "_id" not in like[0]):
            raise DslError(
                'more_like_this.like must be [{"_id": doc_id}]'
            )
        return more_like_this(
            index, documents, int(like[0]["_id"]),
            m=int(body.get("max_query_terms", 5)), k=k,
            synonyms=synonyms,
        )
    if kind == "range":
        # ES range QUERY (query context): metadata range at constant
        # score in _doc order — sugar over constant_score semantics
        # for non-text fields (text ranges belong in bool.filter)
        if after is not None:
            raise DslError("range does not support search_after")
        fld, rb = _one_key(body, "range")
        if not isinstance(rb, dict):
            raise DslError("range needs {field: {gte/gt/lte/lt...}}")
        boost = float(rb.get("boost", 1.0))
        ops = {op: v for op, v in rb.items() if op != "boost"}
        frame = _metadata_filter([{"range": {fld: ops}}], documents)
        if doc_filter is not None:
            frame = frame.join(doc_filter.select("doc_id"), "doc_id",
                               "left_semi")
        # intersect with the index's live docs (tombstones excluded,
        # absent ids never fabricated)
        live = index.doc_stats.select("doc_id")
        if index.tombstone_count():
            live = live.join(index.tombstones.select("doc_id"),
                             "doc_id", "left_anti")
        return (
            live.join(frame, "doc_id", "left_semi")
            .orderBy("doc_id")
            .limit(k)
            .select("doc_id", F.lit(boost).alias("score"))
        )
    if kind == "dis_max":
        # ES dis_max: score = max of sub-query scores + tie_breaker *
        # sum of the rest. Exactness needs every branch's FULL scored
        # match set (a doc outside one branch's top-k can lead the
        # combined ranking), so branches compile to scored_docs and the
        # combine is the same one-hash-aggregate best_fields engine as
        # multi_match (multifield.combine_scored_parts).
        from .multifield import combine_scored_parts
        from .query_exec import scored_docs

        if after is not None:
            raise DslError("search_after does not compose with dis_max yet")
        _no_filter(kind)
        subqs = body.get("queries", [])
        if not subqs:
            raise DslError("dis_max needs queries")
        tie = float(body.get("tie_breaker", 0.0))
        if not 0.0 <= tie <= 1.0:
            raise DslError(f"tie_breaker must be in [0, 1], got {tie}")
        parts = []
        for sq in subqs:
            text, mode = _match_family_text(sq, "dis_max.queries[]")
            parts.append(
                scored_docs(index, text, synonyms=synonyms, mode=mode)
            )
        return combine_scored_parts(parts, "best_fields", tie, k)
    if kind == "boosting":
        # ES boosting query: positive matches keep their score unless
        # they ALSO match the negative query, in which case the score
        # multiplies by negative_boost (a demotion, not an exclusion —
        # that's bool.must_not). Full positive match set + a negative
        # doc_id left-semi flag, then one top-k.
        from .query_exec import matched_docs, scored_docs

        if after is not None:
            raise DslError("search_after does not compose with boosting yet")
        _no_filter(kind)
        if "positive" not in body or "negative" not in body:
            raise DslError("boosting needs positive and negative queries")
        nb = float(body.get("negative_boost", 0.5))
        if not 0.0 <= nb <= 1.0:
            raise DslError(f"negative_boost must be in [0, 1], got {nb}")
        ptext, pmode = _match_family_text(body["positive"],
                                          "boosting.positive")
        ntext, nmode = _match_family_text(body["negative"],
                                          "boosting.negative")
        pos = scored_docs(index, ptext, synonyms=synonyms, mode=pmode)
        neg = matched_docs(index, ntext, synonyms, mode=nmode).select(
            "doc_id", F.lit(True).alias("_demote")
        )
        return (
            pos.join(neg, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("_demote"), F.col("score") * nb)
                .otherwise(F.col("score"))
                .alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )
    if kind == "constant_score":
        # ES constant_score: filter-context match at a fixed boost —
        # recall without scoring (the postings decode skips nothing,
        # but no statistics join and rank is _doc order).
        from .query_exec import matched_docs

        if after is not None:
            raise DslError(
                "search_after does not compose with constant_score yet"
            )
        flt = body.get("filter")
        if flt is None:
            raise DslError("constant_score needs filter")
        boost = float(body.get("boost", 1.0))
        text, mode = _match_family_text(flt, "constant_score.filter")
        m = matched_docs(index, text, synonyms, mode=mode)
        if doc_filter is not None:
            m = m.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        return (
            m.select("doc_id")
            .orderBy("doc_id")
            .limit(k)
            .select("doc_id", F.lit(boost).alias("score"))
        )

    raise DslError(f"unsupported query clause {kind!r}")


def _match_family_text(q: dict, what: str) -> tuple[str, str]:
    """A match-family leaf (match / query_string / term / terms) →
    (query text, or|and mode) — the shared sub-query extractor for
    dis_max / boosting / constant_score / aggs."""
    kind, body = _one_key(q, what)
    if kind == "match":
        fld, b = _field_body(body, "match")
        _require_text_field(fld, "match")
        return str(b["query"]), (
            "and" if b.get("operator", "or") == "and" else "or"
        )
    if kind == "query_string":
        return str(body["query"]), "or"
    if kind == "term":
        fld, b = _field_body(body, "term")
        _require_text_field(fld, "term")
        return str(b["value"]), "or"
    if kind == "terms":
        fld, vals = _one_key(body, "terms")
        _require_text_field(fld, "terms")
        return " ".join(str(v) for v in vals), "or"
    raise DslError(
        f"{what} must be a match-family leaf "
        f"(match/query_string/term/terms), got {kind!r}"
    )


# ---------------------------------------------------------------- aggs


def _run_aggs(
    aggs: dict,
    index: Index,
    q: dict,
    documents: DataFrame | None,
    synonyms,
    _matched: DataFrame | None = None,
) -> dict[str, DataFrame]:
    if _matched is not None:
        # pre-resolved hit set (the global agg's live-doc frame)
        if documents is None:
            raise DslError("aggs need documents= (the metadata table)")
        matched = _matched
        text = mode = None
        kind = "match_all_precompiled"
        return _dispatch_aggs(aggs, index, documents, synonyms,
                              matched, text, mode)
    kind, body = _one_key(q, "query")
    if kind not in ("match", "query_string", "term", "terms",
                    "dis_max", "constant_score"):
        raise DslError(
            "aggs compose with the match family (plus dis_max / "
            f"constant_score over it), not {kind!r}"
        )
    if documents is None:
        raise DslError("aggs need documents= (the metadata table)")
    if kind == "dis_max":
        # hit set = union of the branches' matched sets (scores don't
        # matter to an agg)
        subqs = body.get("queries", [])
        if not subqs:
            raise DslError("dis_max needs queries")
        matched = None
        for sq in subqs:
            t, m = _match_family_text(sq, "dis_max.queries[]")
            part = matched_docs(index, t, synonyms, mode=m).select("doc_id")
            matched = part if matched is None else matched.unionByName(part)
        matched = matched.distinct()
        text = mode = None  # top_hits (needs scores) unsupported here
    elif kind == "constant_score":
        t, m = _match_family_text(body.get("filter"),
                                  "constant_score.filter")
        matched = matched_docs(index, t, synonyms, mode=m)
        text = mode = None
    else:
        if kind == "match":
            _, b = _field_body(body, "match")
            text = str(b["query"])
            mode = "and" if b.get("operator", "or") == "and" else "or"
        elif kind == "query_string":
            text, mode = str(body["query"]), "or"
        elif kind == "term":
            _, b = _field_body(body, "term")
            text, mode = str(b["value"]), "or"
        else:
            _, vals = _one_key(body, "terms")
            text, mode = " ".join(str(v) for v in vals), "or"
        matched = matched_docs(index, text, synonyms, mode=mode)
    return _dispatch_aggs(aggs, index, documents, synonyms, matched,
                          text, mode)


def _dispatch_aggs(
    aggs: dict,
    index: Index,
    documents: DataFrame,
    synonyms,
    matched: DataFrame,
    text,
    mode,
) -> dict[str, DataFrame]:
    from .analytics import (
        composite_agg_facet,
        date_histogram_facet,
        extended_stats_facet,
        filters_facet,
        terms_metrics_facet,
    )
    from .query_exec import (
        cardinality_facet,
        facet_counts,
        histogram_facets,
        percentiles_facet,
        range_facets,
        stats_facet,
        top_hits_facet,
    )

    out: dict[str, DataFrame] = {}
    for name, spec in aggs.items():
        # ES nests sub-aggs as a SIBLING "aggs" key beside the bucket
        # agg — split it off before the single-key dispatch
        subs = spec.get("aggs") if isinstance(spec, dict) else None
        if subs is not None:
            spec = {kk: vv for kk, vv in spec.items() if kk != "aggs"}
        akind, ab = _one_key(spec, f"aggs[{name}]")
        if akind == "global" and subs is not None:
            # ES global agg: the sub-agg computes over ALL live docs,
            # ignoring the query — the corpus-vs-hits comparison panel.
            # Exactly one metric/bucket sub-agg, evaluated with the
            # live-doc set as the hit set.
            live = index.doc_stats.select("doc_id")
            if index.tombstone_count():
                live = live.join(index.tombstones.select("doc_id"),
                                 "doc_id", "left_anti")
            sub = _run_aggs(subs, index,
                            {"match_all_precompiled": None},
                            documents, synonyms, _matched=live)
            for sname, frame in sub.items():
                out[f"{name}.{sname}"] = frame
            continue
        if akind == "auto_date_histogram":
            from .analytics import auto_date_histogram_facet

            out[name] = auto_date_histogram_facet(
                matched, documents, ab["field"],
                buckets=int(ab.get("buckets", 10)))
            continue
        if akind == "diversified_sampler":
            # ES diversified_sampler: like sampler, but at most
            # max_docs_per_value per de-duplication field value in
            # the sample — de-biases the follow-up sub-aggs
            from pyspark.sql import Window

            from .query_exec import scored_docs

            if subs is None:
                raise DslError(
                    "diversified_sampler needs sub-aggs (an aggs body)"
                )
            if text is None:
                raise DslError(
                    "diversified_sampler needs a scoring match-family "
                    "query"
                )
            fld = ab.get("field")
            if not fld:
                raise DslError("diversified_sampler needs field")
            per = int(ab.get("max_docs_per_value", 1))
            shard_size = int(ab.get("shard_size", 100))
            sc = scored_docs(index, text, synonyms, mode=mode).join(
                documents.select("doc_id", fld), "doc_id", "left"
            )
            w = Window.partitionBy(fld).orderBy(
                F.desc("score"), F.asc("doc_id"))
            sampled = (
                sc.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= per)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(shard_size)
                .select("doc_id")
            )
            sub = _dispatch_aggs(subs, index, documents, synonyms,
                                 sampled, None, None)
            for sname, frame in sub.items():
                out[f"{name}.{sname}"] = frame
            continue
        if akind == "sampler":
            # ES sampler agg: sub-aggs run over only the top
            # shard_size BEST-scoring hits (focus follow-up analysis
            # on the most relevant docs). Needs a scoring query.
            from .query_exec import scored_docs

            if subs is None:
                raise DslError("sampler needs sub-aggs (an aggs body)")
            if text is None:
                raise DslError(
                    "sampler needs a scoring match-family query "
                    "(dis_max/constant_score hit sets are unscored)"
                )
            shard_size = int(ab.get("shard_size", 100))
            sampled = (
                scored_docs(index, text, synonyms, mode=mode)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(shard_size)
                .select("doc_id")
            )
            sub = _dispatch_aggs(subs, index, documents, synonyms,
                                 sampled, None, None)
            for sname, frame in sub.items():
                out[f"{name}.{sname}"] = frame
            continue
        if akind in ("date_histogram", "histogram") and subs:
            out[name] = _histogram_with_subs(
                akind, ab, subs, name, matched, documents)
            continue
        if akind in ("max_bucket", "min_bucket", "avg_bucket",
                     "sum_bucket", "stats_bucket",
                     "percentiles_bucket"):
            # ES SIBLING pipeline aggs: summarize a metric across a
            # previously-declared bucket agg ("parent>metric" path)
            from .analytics import (
                percentiles_bucket,
                sibling_bucket_stat,
                stats_bucket,
            )

            path = str(ab.get("buckets_path", ""))
            if ">" not in path:
                raise DslError(
                    f"{akind} needs buckets_path 'parent>metric', "
                    f"got {path!r}"
                )
            parent, metric = path.split(">", 1)
            if parent not in out:
                raise DslError(
                    f"buckets_path parent {parent!r} must be a bucket "
                    "agg declared earlier in the aggs body"
                )
            col = "n_docs" if metric == "_count" else metric
            if col not in out[parent].columns:
                raise DslError(
                    f"buckets_path metric {metric!r} not found in "
                    f"{parent!r} (columns: {out[parent].columns})"
                )
            if akind == "stats_bucket":
                out[name] = stats_bucket(out[parent], col)
            elif akind == "percentiles_bucket":
                out[name] = percentiles_bucket(
                    out[parent], col,
                    tuple(float(p) for p in
                          ab.get("percents", (25.0, 50.0, 75.0))))
            else:
                out[name] = sibling_bucket_stat(out[parent], col, akind)
            continue
        if subs is not None and akind != "terms":
            raise DslError(
                "sub-aggs are supported under terms / sampler / "
                f"histogram / date_histogram / global only, not {akind!r}"
            )
        if akind == "terms":
            if "top_hits" in ab:
                raise DslError("top_hits nests via the sub-aggs form "
                               "or the top_hits agg kind directly")
            if subs:
                # terms + metric sub-aggregations: one groupBy pass
                metrics: dict[str, tuple[str, str]] = {}
                for sname, sspec in subs.items():
                    skind, sb = _one_key(sspec, f"aggs[{name}].aggs[{sname}]")
                    if skind not in ("avg", "sum", "min", "max",
                                     "cardinality"):
                        raise DslError(
                            f"unsupported metric sub-agg {skind!r} "
                            "(avg/sum/min/max/cardinality)"
                        )
                    metrics[sname] = (skind, sb["field"])
                # ES bucket order: {"_count"|"_key"|<metric>: dir}
                o = None
                if "order" in ab:
                    okey, odir = _one_key(ab["order"],
                                          f"aggs[{name}].order")
                    o = (okey, str(odir).lower() == "asc")
                out[name] = terms_metrics_facet(
                    matched, documents, ab["field"], metrics,
                    order=o,
                    size=(int(ab["size"]) if "size" in ab else None),
                )
            else:
                out[name] = facet_counts(
                    matched, documents, [ab["field"]],
                    size=(int(ab["size"]) if "size" in ab else None),
                    min_doc_count=int(ab.get("min_doc_count", 1)),
                    include=ab.get("include"),
                    exclude=ab.get("exclude"),
                    missing=ab.get("missing"),
                )
        elif akind == "histogram":
            out[name] = histogram_facets(matched, documents, ab["field"],
                                         float(ab["interval"]))
        elif akind == "date_histogram":
            out[name] = date_histogram_facet(
                matched, documents, ab["field"],
                ab.get("calendar_interval", "day"))
        elif akind == "range":
            out[name] = range_facets(
                matched, documents, ab["field"],
                _ranges_with_keys(ab.get("ranges"), "range",
                                  numeric=True))
        elif akind == "stats":
            out[name] = stats_facet(matched, documents, ab["field"])
        elif akind == "percentiles":
            out[name] = percentiles_facet(
                matched, documents, ab["field"],
                percents=tuple(ab.get("percents", (25.0, 50.0, 75.0,
                                                   95.0, 99.0))))
        elif akind == "cardinality":
            out[name] = cardinality_facet(matched, documents, ab["field"])
        elif akind == "extended_stats":
            out[name] = extended_stats_facet(
                matched, documents, ab["field"],
                sigma=float(ab.get("sigma", 2.0)))
        elif akind == "filters":
            out[name] = filters_facet(
                matched, documents,
                _compile_agg_predicates(ab.get("filters"), "filters"))
        elif akind == "adjacency_matrix":
            from .analytics import adjacency_matrix_facet

            out[name] = adjacency_matrix_facet(
                matched, documents,
                _compile_agg_predicates(ab.get("filters"),
                                        "adjacency_matrix"))
        elif akind == "missing":
            from .analytics import missing_facet

            out[name] = missing_facet(matched, documents, ab["field"])
        elif akind == "percentile_ranks":
            from .analytics import percentile_ranks_facet

            out[name] = percentile_ranks_facet(
                matched, documents, ab["field"],
                tuple(float(v) for v in ab.get("values", ())))
        elif akind == "composite":
            srcs = []
            for s in ab.get("sources", []):
                sname, sspec = _one_key(s, "composite source")
                skind, sb = _one_key(sspec, f"composite[{sname}]")
                if skind == "terms":
                    srcs.append((sname, "terms", sb["field"]))
                elif skind == "histogram":
                    srcs.append((sname, "histogram", sb["field"],
                                 float(sb["interval"])))
                elif skind == "date_histogram":
                    srcs.append((sname, "date_histogram", sb["field"],
                                 sb.get("calendar_interval", "day")))
                else:
                    raise DslError(
                        f"unsupported composite source {skind!r}"
                    )
            after = ab.get("after")
            if after is not None:
                after = tuple(after[s[0]] for s in srcs)
            out[name] = composite_agg_facet(
                matched, documents, srcs,
                size=int(ab.get("size", 10)), after=after)
        elif akind == "top_hits":
            # ES top_hits ranks within the FULL hit set (not the
            # returned page) — the scored_docs frame, df-proportional
            from .query_exec import scored_docs

            if text is None:
                raise DslError(
                    "top_hits needs a scoring match-family query "
                    "(dis_max/constant_score hit sets are unscored)"
                )
            sc = scored_docs(index, text, synonyms, mode=mode)
            out[name] = top_hits_facet(sc, documents, ab["field"],
                                       n=int(ab.get("size", 3)))
        elif akind == "rare_terms":
            from .analytics import rare_terms_facet

            out[name] = rare_terms_facet(
                matched, documents, ab["field"],
                max_doc_count=int(ab.get("max_doc_count", 1)))
        elif akind == "date_range":
            from .analytics import date_range_facet

            out[name] = date_range_facet(
                matched, documents, ab["field"],
                _ranges_with_keys(ab.get("ranges"), "date_range",
                                  numeric=False))
        elif akind == "multi_terms":
            from .analytics import multi_terms_facet

            flds = [t["field"] for t in ab.get("terms", [])]
            out[name] = multi_terms_facet(
                matched, documents, flds,
                size=int(ab.get("size", 10)),
                min_doc_count=int(ab.get("min_doc_count", 1)))
        elif akind in ("avg", "sum", "min", "max", "value_count",
                       "weighted_avg"):
            from .analytics import single_metric_facet

            if akind == "weighted_avg":
                # ES shape: {value: {field}, weight: {field}}
                out[name] = single_metric_facet(
                    matched, documents, akind,
                    ab["value"]["field"],
                    weight_field=ab["weight"]["field"])
            else:
                out[name] = single_metric_facet(
                    matched, documents, akind, ab["field"])
        elif akind == "top_metrics":
            from .analytics import top_metrics_facet

            ms = ab.get("metrics")
            if isinstance(ms, dict):
                ms = [ms]
            if not isinstance(ms, list) or not ms:
                raise DslError("top_metrics needs metrics: {field} "
                               "(or a list of them)")
            sfld, sdir = _one_key(ab.get("sort"),
                                  f"aggs[{name}].sort")
            out[name] = top_metrics_facet(
                matched, documents, [m["field"] for m in ms], sfld,
                ascending=(str(sdir).lower() == "asc"),
                size=int(ab.get("size", 1)))
        elif akind in ("significant_terms", "significant_text"):
            from .analytics import significant_terms

            bgf = ab.get("background_filter")
            bg = None
            if bgf is not None:
                bg = _metadata_filter(
                    bgf if isinstance(bgf, list) else [bgf], documents)
            out[name] = significant_terms(
                index, documents, text or "",
                k=int(ab.get("size", 20)),
                min_fg_df=int(ab.get("min_doc_count", 2)),
                synonyms=synonyms, fg=matched, background=bg)
        else:
            raise DslError(f"unsupported agg kind {akind!r}")
    return out


def _ranges_with_keys(ranges, what: str, *, numeric: bool) -> list[tuple]:
    """ES range/date_range ``ranges`` bodies → ``(label, lo, hi)``
    triples. The label is the explicit ``key`` when given, else ES's
    auto key ``"<from>-<to>"`` with ``*`` for an open side (numeric
    ranges format the bound as a float, mirroring ES)."""
    if not isinstance(ranges, list) or not ranges:
        raise DslError(f"{what} agg needs a non-empty ranges list")
    out = []
    for r in ranges:
        lo, hi = r.get("from"), r.get("to")
        key = r.get("key")
        if key is None:
            def _side(v):
                if v is None:
                    return "*"
                return str(float(v)) if numeric else str(v)
            key = f"{_side(lo)}-{_side(hi)}"
        out.append((str(key), lo, hi))
    return out



def _histogram_with_subs(akind, ab, subs, name, matched, documents):
    """(date_)histogram bucket agg with metric AND pipeline sub-aggs:
    metrics fold into the single groupBy pass; pipeline sub-aggs
    (derivative / cumulative_sum / moving_fn) run as window passes
    over the bucket-sized frame IN DECLARATION ORDER, each one
    referencing an earlier metric (or ``_count``) via buckets_path —
    ES's parent-pipeline shape."""
    from .analytics import (
        cumulative_sum_col,
        date_histogram_metrics_facet,
        derivative_col,
        histogram_metrics_facet,
        moving_avg_col,
    )

    metrics: dict[str, tuple[str, str]] = {}
    pipes: list[tuple[str, str, dict]] = []
    for sname, sspec in subs.items():
        skind, sb = _one_key(sspec, f"aggs[{name}].aggs[{sname}]")
        if skind in ("avg", "sum", "min", "max", "cardinality"):
            metrics[sname] = (skind, sb["field"])
        elif skind in ("derivative", "cumulative_sum", "moving_fn",
                       "serial_diff", "bucket_script",
                       "bucket_selector"):
            pipes.append((sname, skind, sb))
        else:
            raise DslError(
                f"unsupported {akind} sub-agg {skind!r} (metrics "
                "avg/sum/min/max/cardinality or pipelines derivative/"
                "cumulative_sum/moving_fn/serial_diff/bucket_script/"
                "bucket_selector)"
            )
    if akind == "date_histogram":
        frame = date_histogram_metrics_facet(
            matched, documents, ab["field"],
            ab.get("calendar_interval", "day"), metrics)
    else:
        frame = histogram_metrics_facet(
            matched, documents, ab["field"], float(ab["interval"]),
            metrics)
    seen = {"_count"} | set(metrics)
    for sname, skind, sb in pipes:
        if skind in ("bucket_script", "bucket_selector"):
            # map-valued buckets_path: {script name: metric}
            from .analytics import bucket_script_col, bucket_selector

            paths = sb.get("buckets_path")
            if not isinstance(paths, dict) or not paths:
                raise DslError(
                    f"{skind} needs buckets_path as a "
                    "{name: metric} map"
                )
            bad = [v for v in paths.values() if v not in seen]
            if bad:
                raise DslError(
                    f"{skind} buckets_path values {bad} must name "
                    f"_count or an earlier sub-agg of {name!r}"
                )
            try:
                if skind == "bucket_script":
                    frame = bucket_script_col(frame, paths,
                                              str(sb["script"]), sname)
                    seen.add(sname)
                else:
                    frame = bucket_selector(frame, paths,
                                            str(sb["script"]))
            except ValueError as exc:
                raise DslError(str(exc)) from exc
            continue
        path = str(sb.get("buckets_path", ""))
        if path not in seen:
            raise DslError(
                f"pipeline agg {sname!r} buckets_path {path!r} must "
                f"name _count or an earlier sub-agg of {name!r}"
            )
        col = "n_docs" if path == "_count" else path
        if skind == "derivative":
            frame = derivative_col(frame, col, out_col=sname)
        elif skind == "cumulative_sum":
            frame = cumulative_sum_col(frame, col, out_col=sname)
        elif skind == "serial_diff":
            from .analytics import serial_diff_col

            frame = serial_diff_col(frame, col,
                                    lag=int(sb.get("lag", 1)),
                                    out_col=sname)
        else:
            script = sb.get("script")
            if script not in (None,
                              "MovingFunctions.unweightedAvg(values)"):
                raise DslError(
                    "moving_fn supports "
                    "MovingFunctions.unweightedAvg(values) only"
                )
            frame = moving_avg_col(frame, col, int(sb["window"]),
                                   out_col=sname)
        seen.add(sname)
    return frame


def _compile_agg_predicates(named, what: str) -> dict:
    """{name: term/range clause} → {name: boolean Column} (the shared
    predicate compiler for the filters / adjacency_matrix aggs)."""
    if not isinstance(named, dict) or not named:
        raise DslError(f"{what} agg needs {{filters: {{name: "
                       "term/range clause}}}")
    preds: dict[str, object] = {}
    for fname, clause in named.items():
        fkind, fb = _one_key(clause, f"{what}[{fname}]")
        if fkind == "term":
            fld, tb = _field_body(fb, "term")
            preds[fname] = F.col(fld) == F.lit(tb["value"])
        elif fkind == "range":
            fld, rb = _one_key(fb, "range")
            cond = F.lit(True)
            ops = {"gte": "__ge__", "gt": "__gt__",
                   "lte": "__le__", "lt": "__lt__"}
            for op, v in rb.items():
                if op not in ops:
                    raise DslError(f"unknown range operator {op!r}")
                cond = cond & getattr(F.col(fld), ops[op])(F.lit(v))
            preds[fname] = cond
        else:
            raise DslError(
                f"unsupported {what} clause {fkind!r} (term/range only)"
            )
    return preds


# ---------------------------------------------------------------- main


def _run_suggest(spec: dict, index: Index, lm_tables) -> dict:
    """ES ``suggest`` section: ``completion`` (lexicon prefix,
    df-ranked — :func:`~.query_exec.suggest_terms`), ``term``
    (single-token spell candidates —
    :func:`~.query_exec.fuzzy_terms`), ``phrase`` (whole-query
    did-you-mean over the corpus LM — :func:`~.lm.suggest_phrase`;
    needs ``lm_tables=(unigrams, bigrams)``)."""
    out = {}
    for name, s in spec.items():
        kinds = [kk for kk in s if kk in ("completion", "term", "phrase")]
        if len(kinds) != 1:
            raise DslError(
                f"suggest[{name}] needs exactly one of "
                "completion/term/phrase"
            )
        kind, b = kinds[0], s[kinds[0]]
        if kind == "completion":
            from .query_exec import suggest_terms

            out[name] = suggest_terms(index, str(s.get("prefix",
                                                       b.get("prefix", ""))),
                                      k=int(b.get("size", 10)))
        elif kind == "term":
            from .query_exec import fuzzy_terms

            text = str(s.get("text", b.get("text", "")))
            if len(text.split()) != 1:
                raise DslError("term suggester takes a single token")
            out[name] = fuzzy_terms(index, text,
                                    max_edits=int(b.get("max_edits", 1)),
                                    k=int(b.get("size", 5)))
        elif kind == "phrase":
            from .lm import suggest_phrase

            if lm_tables is None:
                raise DslError(
                    "phrase suggester needs lm_tables=(unigrams, bigrams)"
                )
            out[name] = suggest_phrase(
                index.spark, str(s.get("text", b.get("text", ""))),
                lm_tables[0], lm_tables[1],
                topn=int(b.get("size", 3)),
            )
        else:
            raise DslError(f"unsupported suggester {kind!r}")
    return out


def search_dsl(
    index: Index,
    body: dict,
    documents: DataFrame | None = None,
    multifield=None,
    embeddings: DataFrame | None = None,
    synonyms: dict[str, str] | None = None,
    lm_tables=None,
) -> DslResult:
    """Execute an ES-style request body. See the module docstring for
    the supported subset; every clause runs an existing exact engine
    path, so DSL results are identical to the direct calls by
    construction (and by test).

    ``knn`` (ES 8 dense-vector search, needs ``embeddings=``):
    ``{"knn": {"field": "embedding", "query_vector": [...], "k": n,
    "id_field": "vec_id"}}`` alone → exact cosine top-k
    (:func:`~.similarity.cosine_topk`; swap in an LSH/IVF/int8 table
    upstream for the approximate paths). ``knn`` + ``query`` requires
    ``"rank": {"rrf": {"rank_window_size": w, "rank_constant": c}}``
    (the ES RRF retriever) and maps to :func:`~.hybrid.hybrid_topk` —
    hits are ``(doc_id, rrf, lex_rank, vec_rank)``."""
    if not isinstance(body, dict) or not (
        "query" in body or "knn" in body or "suggest" in body
    ):
        raise DslError('body must carry "query", "knn", and/or "suggest"')
    unknown = set(body) - {"query", "size", "search_after", "similarity",
                           "aggs", "knn", "rank", "collapse", "highlight",
                           "sort", "suggest", "fields",
                           "track_total_hits", "min_score", "explain",
                           "runtime_mappings"}
    if unknown:
        raise DslError(f"unsupported body keys {sorted(unknown)}")
    if body.get("runtime_mappings"):
        documents = _apply_runtime_mappings(body["runtime_mappings"], documents)
    suggest = {}
    if body.get("suggest"):
        suggest = _run_suggest(body["suggest"], index, lm_tables)
        if "query" not in body and "knn" not in body:
            return DslResult(hits=None, suggest=suggest)
    k = int(body.get("size", 10))
    after = body.get("search_after")
    if after is not None:
        after = (int(after[0]), float(after[1]))

    if "knn" in body:
        knn = body["knn"]
        if embeddings is None:
            raise DslError("knn needs embeddings= (the vector table)")
        if after is not None or body.get("similarity") or body.get("aggs"):
            raise DslError(
                "knn composes with size/rank only "
                "(no search_after/similarity/aggs yet)"
            )
        vec = [float(x) for x in knn["query_vector"]]
        vcol = knn.get("field", "embedding")
        icol = knn.get("id_field", "vec_id")
        # dim guard: a mismatched query vector would yield all-null
        # cosines (zip_with pads with null) — fail loudly instead.
        # One 1-row probe, DSL-layer only (the hot ops stay unguarded).
        row = embeddings.select(F.size(F.col(vcol)).alias("d")).first()
        if row is not None and int(row["d"]) != len(vec):
            raise DslError(
                f"query_vector has {len(vec)} dims but {vcol!r} has "
                f"{int(row['d'])}"
            )
        emb = embeddings
        if knn.get("filter") is not None:
            # ES filtered kNN: metadata predicates restrict the
            # CANDIDATE set before scoring (post-filtering would
            # starve k). The filter compiles against documents= and
            # semi-joins the vector table on the id column.
            flt = knn["filter"]
            allowed = _metadata_filter(
                flt if isinstance(flt, list) else [flt], documents)
            emb = emb.join(
                allowed.select(F.col("doc_id").alias(icol)),
                icol, "left_semi")
        if "query" not in body:
            from .similarity import cosine_topk

            if "rank" in body:
                raise DslError("rank applies to knn + query hybrids")
            return DslResult(hits=cosine_topk(
                emb, vec, k=int(knn.get("k", k)),
                id_col=icol, vec_col=vcol,
            ), suggest=suggest)
        rank = body.get("rank")
        if not rank or "rrf" not in rank:
            raise DslError(
                'knn + query needs "rank": {"rrf": {...}} (the ES RRF '
                "retriever — this engine fuses hybrids by RRF)"
            )
        qk, qb = _one_key(body["query"], "query")
        if qk not in ("match", "query_string", "term", "terms"):
            raise DslError(
                f"knn hybrids take a match-family query, not {qk!r}"
            )
        if qk == "match":
            fld, b = _field_body(qb, "match")
            _require_text_field(fld, "match")
            text = str(b["query"])
        elif qk == "query_string":
            text = str(qb["query"])
        elif qk == "term":
            _, b = _field_body(qb, "term")
            text = str(b["value"])
        else:
            _, vals = _one_key(qb, "terms")
            text = " ".join(str(v) for v in vals)
        from .hybrid import RRF_K_DEFAULT, hybrid_topk

        rrf = rank["rrf"]
        w = int(rrf.get("rank_window_size", 50))
        return DslResult(hits=hybrid_topk(
            index, text, emb, vec, k=k, k_lex=w,
            k_vec=int(knn.get("k", w)),
            rrf_k=int(rrf.get("rank_constant", RRF_K_DEFAULT)),
            id_col=icol, vec_col=vcol,
        ), suggest=suggest)

    post = [kk for kk in ("collapse", "highlight", "sort") if kk in body]
    if post:
        qk0, _ = _one_key(body["query"], "query")
        if qk0 not in ("match", "query_string", "term", "terms", "bool"):
            raise DslError(
                f"{'/'.join(post)} compose with the match family, not "
                f"{qk0!r}"
            )
        if documents is None:
            raise DslError(f"{'/'.join(post)} need documents=")

    if "sort" in body:
        # ES field sort REPLACES relevance: eligible docs ordered by
        # the metadata field — matched set semi-join, TakeOrdered, no
        # scoring at all. Exclusive with the score-shaped stages.
        if len(body["sort"]) != 1 or len(post) > 1 or after is not None:
            raise DslError(
                "sort supports exactly one field and composes only "
                "with query/size"
            )
        fld, spec = _one_key(body["sort"][0], "sort")
        order = (spec if isinstance(spec, str)
                 else spec.get("order", "asc"))
        qk0, qb0 = _one_key(body["query"], "query")
        if qk0 == "bool":
            raise DslError("sort composes with match/term queries")
        text = _query_text(qk0, qb0)
        m = matched_docs(index, text, synonyms,
                         mode=_query_mode(qk0, qb0))
        col = F.col(fld)
        return DslResult(hits=(
            documents.join(m.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", fld)
            .orderBy(col.desc() if order == "desc" else col.asc(),
                     F.col("doc_id").asc())
            .limit(k)
        ), suggest=suggest)

    collapse = body.get("collapse")
    over = int(collapse.get("window", 50)) if collapse else k
    hits = _compile(body["query"], index, max(k, over), after,
                    body.get("similarity"), synonyms, documents,
                    multifield, None)
    inner = {}
    if collapse:
        # ES field collapsing over a ranked window (the established
        # collapsed_search semantics): best doc per key within the
        # top-`window`, then the k best keys
        from .query_exec import collapse_topk

        hits = collapse_topk(
            hits, documents.select("doc_id", collapse["field"]),
            collapse["field"], k=k,
        )
        ih = collapse.get("inner_hits")
        if ih:
            # ES inner_hits: per collapsed group, the top-size docs
            # from the FULL scored match set ("N more from this site")
            from .query_exec import collapse_inner_hits, scored_docs

            qk0, qb0 = _one_key(body["query"], "query")
            if qk0 == "bool":
                raise DslError(
                    "collapse.inner_hits composes with match/term "
                    "queries"
                )
            sc = scored_docs(index, _query_text(qk0, qb0), synonyms,
                             mode=_query_mode(qk0, qb0))
            inner[str(ih.get("name", "inner"))] = collapse_inner_hits(
                hits, sc, documents.select("doc_id", collapse["field"]),
                collapse["field"], n=int(ih.get("size", 3)),
            )
    if body.get("highlight"):
        from .query_exec import materialize_with_snippets, parse_query

        h = body["highlight"]
        fields = h.get("fields", {"text": {}})
        if set(fields) != {"text"}:
            raise DslError("highlight supports the text field")
        frag = int(fields["text"].get("fragment_size", 80)) // 2
        mark = None
        if "pre_tags" in h or "post_tags" in h:
            mark = (str((h.get("pre_tags") or ["<em>"])[0]),
                    str((h.get("post_tags") or ["</em>"])[0]))
        qk0, qb0 = _one_key(body["query"], "query")
        terms = parse_query(_query_text(qk0, qb0), synonyms,
                            index.token_fn())
        nfrags = int(fields["text"].get("number_of_fragments", 1))
        if nfrags > 1:
            # ES number_of_fragments > 1: one window per matching
            # query term (snippet_fragments), no marking pass. On an
            # ANALYZED index the stored text no longer literally
            # contains the indexed terms (stem/fold/CJK) — route
            # through the analyzer-aware highlighter, which re-analyzes
            # the k hit rows with the index's own token_fn.
            from .query_exec import (
                snippet_fragments,
                snippet_fragments_analyzed,
            )

            if mark is not None:
                raise DslError(
                    "pre/post tags compose with single-fragment "
                    "highlighting only"
                )
            if index.token_fn() is not None:
                hits = snippet_fragments_analyzed(
                    hits, documents, index, terms,
                    width=frag, n_fragments=nfrags)
            else:
                hits = snippet_fragments(hits, documents, terms,
                                         width=frag, n_fragments=nfrags)
        else:
            hits = materialize_with_snippets(hits, documents, terms,
                                             width=frag, mark=mark)
    if body.get("min_score") is not None:
        # ES min_score: drop page hits below the threshold (applies
        # to the returned page, after ranking — ES semantics for the
        # non-rescore case)
        if "score" not in hits.columns:
            raise DslError("min_score needs a scored result")
        hits = hits.where(
            F.col("score") >= float(body["min_score"]))
    explain = None
    if body.get("explain"):
        # ES explain=true: a per-term Explanation for every page hit.
        # Needs the page doc_ids, so the hits frame is materialized
        # here (k rows) — the one eager step in the DSL, documented.
        from .query_exec import explain_hits

        qk0, qb0 = _one_key(body["query"], "query")
        if qk0 not in ("match", "query_string", "term", "terms"):
            raise DslError("explain composes with the match family")
        if "doc_id" not in hits.columns:
            raise DslError("explain needs doc_id on the hits")
        page_ids = [r["doc_id"] for r in hits.select("doc_id").collect()]
        explain = explain_hits(index, _query_text(qk0, qb0), page_ids,
                               synonyms=synonyms)
    if body.get("fields"):
        # ES fields retrieval: metadata columns joined onto the hits
        # (k-row broadcast into the corpus-sized table; missing docs
        # keep null fields). Re-sorted afterwards — a join does not
        # preserve order.
        flds = [str(f_) for f_ in body["fields"]]
        if documents is None:
            raise DslError("fields needs documents= (the metadata table)")
        dup = [f_ for f_ in flds if f_ in hits.columns]
        if dup:
            raise DslError(f"fields {dup} already present on the hits")
        hits = F.broadcast(hits).join(
            documents.select("doc_id", *flds), "doc_id", "left"
        )
        if "score" in hits.columns:
            hits = hits.orderBy(F.desc("score"), F.asc("doc_id"))
    total = None
    if body.get("track_total_hits"):
        # ES track_total_hits=true: the exact full hit count beside
        # the page — one pruned postings decode + count, lazy
        from .analytics import count_matches

        qk0, qb0 = _one_key(body["query"], "query")
        if qk0 not in ("match", "query_string", "term", "terms"):
            raise DslError(
                "track_total_hits composes with the match family"
            )
        total = count_matches(index, _query_text(qk0, qb0), synonyms,
                              mode=_query_mode(qk0, qb0))
    aggs = {}
    if body.get("aggs"):
        aggs = _run_aggs(body["aggs"], index, body["query"], documents,
                         synonyms)
    return DslResult(hits=hits, aggs=aggs, suggest=suggest,
                     inner_hits=inner, total=total, explain=explain)


def _query_text(kind: str, body) -> str:
    if kind == "match":
        fld, b = _field_body(body, "match")
        _require_text_field(fld, "match")
        return str(b["query"])
    if kind == "query_string":
        return str(body["query"])
    if kind == "term":
        fld, b = _field_body(body, "term")
        _require_text_field(fld, "term")
        return str(b["value"])
    if kind == "terms":
        _, vals = _one_key(body, "terms")
        return " ".join(str(v) for v in vals)
    raise DslError(f"no query text for clause {kind!r}")


def _query_mode(kind: str, body) -> str:
    if kind == "match":
        _, b = _field_body(body, "match")
        return "and" if b.get("operator", "or") == "and" else "or"
    return "or"


def msearch_dsl(
    index: Index,
    bodies: list[dict],
    **kwargs,
) -> list[DslResult]:
    """ES ``_msearch``: execute several request bodies against the
    same index in one call, results in request order. Each body
    compiles through :func:`search_dsl` unchanged (identical results
    to issuing them singly — the multiplexing is purely a round-trip
    saver, like the HTTP endpoint it mirrors). Compilation is lazy —
    no Spark job runs until a result's frame is consumed, so a caller
    collecting all of them lets the scheduler overlap the jobs.

    For the high-throughput SAME-SHAPE case (many plain match
    queries), prefer :func:`~.query_exec.search_topk_batch`, which
    shares one union-pruned postings scan across the whole set; this
    endpoint is for heterogeneous bodies (different query kinds,
    aggs, knn) where per-body plans are inherent. Reference analog:
    the serving layer issues one HTTP call per query
    (server/src/services/search.service.js) — this is the batched
    form."""
    if not isinstance(bodies, list) or not bodies:
        raise DslError("msearch needs a non-empty list of bodies")
    return [search_dsl(index, b, **kwargs) for b in bodies]


_TMPL_VAR = re.compile(r"\{\{(\w+)\}\}")


def render_search_template(source: dict, params: dict) -> dict:
    """ES ``_search/template`` (the mustache subset real templates
    use): substitute ``{{var}}`` placeholders in the request body.
    A string that IS exactly one placeholder takes the param value
    with its TYPE intact (numbers stay numbers, lists stay lists —
    the ``{{#toJson}}`` cases that matter); placeholders embedded in
    longer strings substitute as text. Unknown variables raise —
    ES renders them empty, which silently breaks queries; failing
    loudly is the engine's standing contract. Conditional sections
    (``{{#var}}``) are not supported — keep templates declarative."""
    if not isinstance(source, dict):
        raise DslError("template source must be a request-body object")

    def _lookup(name: str):
        if name not in params:
            raise DslError(f"template variable {name!r} has no value")
        return params[name]

    def walk(x):
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        if isinstance(x, list):
            return [walk(v) for v in x]
        if isinstance(x, str):
            m = _TMPL_VAR.fullmatch(x)
            if m:
                return _lookup(m.group(1))
            if "{{#" in x or "{{^" in x:
                raise DslError(
                    "mustache sections ({{#...}}/{{^...}}) are not "
                    "supported"
                )
            return _TMPL_VAR.sub(lambda mm: str(_lookup(mm.group(1))), x)
        return x

    return walk(source)


def search_template(
    index: Index,
    source: dict,
    params: dict,
    **kwargs,
) -> DslResult:
    """Render a search template and execute it — the ES
    ``_search/template`` endpoint in one call."""
    return search_dsl(index, render_search_template(source, params),
                      **kwargs)
