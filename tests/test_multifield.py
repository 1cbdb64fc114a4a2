"""scored_docs (full scored match set), multi-field indexes +
multi_match combine semantics, and ES function_score — parity with
brute-force references, cross-serving identity, error surfaces."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hadoop_search_engine_spark.functions.bm25 import idf as _idf
from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.hybrid import function_score
from hadoop_search_engine_spark.operators.multifield import (
    MultiFieldIndex,
    build_multifield_index,
    multi_match,
    multi_match_rows,
)
from hadoop_search_engine_spark.operators.query_exec import (
    scored_docs,
    scored_docs_pairs,
    search_topk_rows,
)

QUERY = "w00000 w00017"
K1, B = 1.2, 0.75


def _pairs(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _close(a, b, tol=1e-9):
    return len(a) == len(b) and all(
        x[0] == y[0] and abs(x[1] - y[1]) <= tol for x, y in zip(a, b)
    )


def _bm25_all(rows, terms):
    """Brute-force full match set: doc -> BM25 score."""
    postings, dls = {}, {}
    for d, txt in rows:
        toks = tokenize(txt)
        if not toks:
            continue
        dls[d] = len(toks)
        for t, tf in Counter(toks).items():
            postings.setdefault(t, {})[d] = tf
    n = len(dls)
    avg = sum(dls.values()) / n if n else 0.0
    out: dict[int, float] = {}
    for t in sorted(set(terms)):
        pl = postings.get(t, {})
        if not pl:
            continue
        w = _idf(n, len(pl))
        for d, tf in pl.items():
            dl = dls[d]
            out[d] = out.get(d, 0.0) + w * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl / avg)
            )
    return out


# ------------------------------------------------------ scored_docs


def test_match_scores_is_full_match_set(tiny_index, tiny_corpus):
    rows = [(r["doc_id"], r["text"]) for r in
            tiny_corpus.select("doc_id", "text").collect()]
    ref = sorted(_bm25_all(rows, QUERY.split()).items(),
                 key=lambda kv: (-kv[1], kv[0]))
    drv = scored_docs_pairs(tiny_index, QUERY)
    spk = sorted(_pairs(scored_docs(tiny_index, QUERY)),
                 key=lambda kv: (-kv[1], kv[0]))
    assert _close(drv, ref)
    assert _close(spk, ref)
    # identical to search_topk with k = everything
    assert drv == search_topk_rows(tiny_index, QUERY, k=10**6)


def test_match_scores_boost_scales(tiny_index):
    base = scored_docs_pairs(tiny_index, QUERY)
    scaled = scored_docs_pairs(tiny_index, QUERY, boost=2.5)
    assert _close(scaled, [(d, 2.5 * s) for d, s in base], tol=1e-9)


def test_match_scores_similarity_composes(tiny_index):
    got = scored_docs_pairs(tiny_index, QUERY, similarity="boolean")
    assert got and all(s in (1.0, 2.0) for _, s in got)


# -------------------------------------------------------- multifield


@pytest.fixture(scope="module")
def mf(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    fields = {
        "title": F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " "),
        "body": F.array_join(
            F.slice(F.split(F.col("text"), " "), 9, 1 << 20), " "
        ),
    }
    return build_multifield_index(spark, tiny_corpus, out, fields,
                                  num_shards=4, n_buckets=8, block_size=16)


@pytest.fixture(scope="module")
def field_rows(tiny_corpus):
    rows = [(r["doc_id"], r["text"]) for r in
            tiny_corpus.select("doc_id", "text").collect()]
    title = [(d, " ".join(t.split(" ")[:8])) for d, t in rows]
    body = [(d, " ".join(t.split(" ")[8:])) for d, t in rows]
    return title, body


def test_multi_match_most_fields_matches_reference(mf, field_rows):
    title, body = field_rows
    ts = _bm25_all(title, QUERY.split())
    bs = _bm25_all(body, QUERY.split())
    comb: dict[int, float] = {}
    for d, s in ts.items():
        comb[d] = comb.get(d, 0.0) + 3.0 * s
    for d, s in bs.items():
        comb[d] = comb.get(d, 0.0) + s
    ref = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    boosts = {"title": 3.0, "body": 1.0}
    drv = multi_match_rows(mf, QUERY, k=10, boosts=boosts)
    spk = _pairs(multi_match(mf, QUERY, k=10, boosts=boosts))
    assert _close(drv, ref, tol=1e-9)
    assert _close(spk, ref, tol=1e-9)


def test_best_fields_matches_reference(mf, field_rows):
    title, body = field_rows
    ts = _bm25_all(title, QUERY.split())
    bs = _bm25_all(body, QUERY.split())
    tb = 0.3
    comb = {}
    for d in set(ts) | set(bs):
        vals = [v for v in (ts.get(d), bs.get(d)) if v is not None]
        comb[d] = max(vals) + tb * (sum(vals) - max(vals))
    ref = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = multi_match_rows(mf, QUERY, k=10, combine="best_fields",
                           tie_breaker=tb)
    assert _close(got, ref, tol=1e-9)


def test_best_fields_tie_breaker_identities(mf):
    most = multi_match_rows(mf, QUERY, k=10)
    tb1 = multi_match_rows(mf, QUERY, k=10, combine="best_fields",
                           tie_breaker=1.0)
    assert _close(tb1, most, tol=1e-9)


def test_single_field_equals_plain_search(mf):
    got = multi_match_rows(mf, QUERY, k=10, boosts={"title": 1.0})
    plain = search_topk_rows(mf.fields["title"], QUERY, k=10)
    assert _close(got, plain)


def test_and_mode_per_field_conjunctive(mf, field_rows):
    title, body = field_rows
    terms = QUERY.split()

    def all_terms(rows):
        out = set()
        for d, t in rows:
            toks = set(tokenize(t))
            if all(q in toks for q in terms):
                out.add(d)
        return out

    eligible = all_terms(title) | all_terms(body)
    got = multi_match_rows(mf, QUERY, k=10**6, mode="and")
    assert {d for d, _ in got} == eligible


def test_multifield_load_roundtrip(spark, mf):
    re = MultiFieldIndex.load(spark, mf.out_dir)
    assert sorted(re.fields) == ["body", "title"]
    assert multi_match_rows(re, QUERY, k=5) == multi_match_rows(mf, QUERY, k=5)


def test_multifield_errors(spark, tiny_corpus, mf, tmp_path):
    with pytest.raises(ValueError, match="at least one field"):
        build_multifield_index(spark, tiny_corpus, str(tmp_path / "x"), {})
    with pytest.raises(ValueError, match="bad field name"):
        build_multifield_index(spark, tiny_corpus, str(tmp_path / "y"),
                               {"a/b": F.col("text")})
    with pytest.raises(ValueError, match="unknown fields"):
        multi_match_rows(mf, QUERY, boosts={"anchor": 1.0})
    with pytest.raises(ValueError, match="combine"):
        multi_match_rows(mf, QUERY, combine="sum")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_rows(mf, QUERY, combine="best_fields", tie_breaker=2.0)


# ----------------------------------------------------- function_score


@pytest.fixture(scope="module")
def docs_n(tiny_corpus):
    return tiny_corpus.withColumn("n_chars", F.length("text")).persist()


def _r(x: float, n: int) -> float:
    """Spark F.round semantics on doubles: BigDecimal.valueOf uses the
    SHORTEST decimal repr (= Python repr), then HALF_UP — differs from
    both Python round() (half-even) and exact-binary quantization at
    .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{n}"),
                                           rounding=ROUND_HALF_UP))


def _fs_ref(tiny_index, docs_n, factor_fn, boost_mode="multiply", k=10):
    nch = {int(r["doc_id"]): int(r["n_chars"])
           for r in docs_n.select("doc_id", "n_chars").collect()}
    rel = dict(scored_docs_pairs(tiny_index, QUERY))
    out = []
    for d, s in rel.items():
        fac = _r(factor_fn(nch[d]), 6)
        r = _r(s, 4)
        c = r * fac if boost_mode == "multiply" else (
            r + fac if boost_mode == "sum" else fac)
        out.append((d, _r(c, 6)))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_matches_reference(tiny_index, docs_n, kind):
    o, s, dec = 800.0, 400.0, 0.5

    def fac(x):
        d = max(0.0, abs(x - o))
        if kind == "gauss":
            return math.exp(-(d * d) / (-(s * s) / math.log(dec)))
        if kind == "exp":
            return math.exp(d * math.log(dec) / s)
        big = s / (1.0 - dec)
        return max(0.0, (big - d) / big)

    ref = _fs_ref(tiny_index, docs_n, fac)
    got = _pairs(function_score(
        tiny_index, QUERY, docs_n, k=10,
        decay={"kind": kind, "field": "n_chars", "origin": o, "scale": s},
    ))
    assert got == ref


def test_field_value_factor_and_boost_modes(tiny_index, docs_n):
    def fac(x):
        return math.log1p(x * 0.001)

    for bm in ("multiply", "sum", "replace"):
        ref = _fs_ref(tiny_index, docs_n, fac, boost_mode=bm)
        got = _pairs(function_score(
            tiny_index, QUERY, docs_n, k=10, boost_mode=bm,
            field_value_factor={"field": "n_chars", "factor": 0.001,
                                "modifier": "log1p"},
        ))
        assert got == ref


def test_missing_decay_field_is_factor_one(tiny_index, docs_n):
    # docs frame missing half the matched docs -> left-join nulls ->
    # decay factor 1 (ES semantics), relevance order preserved there
    some = docs_n.where("doc_id % 2 = 0")
    got = {d: f for d, f in (
        (r["doc_id"], r["factor"]) for r in function_score(
            tiny_index, QUERY, some, k=10**6,
            decay={"kind": "gauss", "field": "n_chars",
                   "origin": 0.0, "scale": 100.0},
        ).collect()
    )}
    assert any(d % 2 == 1 for d in got)
    assert all(f == 1.0 for d, f in got.items() if d % 2 == 1)


def test_function_score_errors(tiny_index, docs_n):
    with pytest.raises(ValueError, match="decay, field_value_factor"):
        function_score(tiny_index, QUERY, docs_n)
    with pytest.raises(ValueError, match="boost_mode"):
        function_score(tiny_index, QUERY, docs_n, boost_mode="avg",
                       field_value_factor={"field": "n_chars"})
    with pytest.raises(ValueError, match="decay kind"):
        function_score(tiny_index, QUERY, docs_n,
                       decay={"kind": "cosine", "field": "n_chars",
                              "origin": 0, "scale": 1})
    with pytest.raises(ValueError, match="modifier"):
        function_score(tiny_index, QUERY, docs_n,
                       field_value_factor={"field": "n_chars",
                                           "modifier": "square"})


# ---------------------------------------------------------- cross_fields


def _cross_ref(field_rows, terms, weights=(3.0, 1.0), mode="or"):
    """Literal cross_fields reference: per term, max weighted per-field
    BM25 (6dp), summed; and-mode requires every matching-anywhere term."""
    title, body = field_rows
    per_term: dict[tuple[int, str], float] = {}
    for t in sorted(set(terms)):
        for rows, w in zip((title, body), weights):
            for d, s in _bm25_all(rows, [t]).items():
                key = (d, t)
                per_term[key] = max(per_term.get(key, 0.0), w * s)
    req = {t for (_d, t) in per_term}
    comb: dict[int, dict[str, float]] = {}
    for (d, t), s in per_term.items():
        comb.setdefault(d, {})[t] = round(s, 6)
    out = {}
    for d, by_t in comb.items():
        if mode == "and" and set(by_t) != req:
            continue
        out[d] = round(sum(sorted(by_t.values())), 6)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_cross_fields_matches_reference(mf, field_rows):
    from hadoop_search_engine_spark.operators.multifield import multi_match

    boosts = {"title": 3.0, "body": 1.0}
    got = _pairs(multi_match(mf, QUERY, k=10, boosts=boosts,
                             combine="cross_fields"))
    ref = _cross_ref(field_rows, QUERY.split())[:10]
    assert _close(got, ref, tol=1e-6)


def test_cross_fields_and_mode_per_term(mf, field_rows):
    from hadoop_search_engine_spark.operators.multifield import multi_match

    boosts = {"title": 3.0, "body": 1.0}
    got = _pairs(multi_match(mf, QUERY, k=50, boosts=boosts,
                             combine="cross_fields", mode="and"))
    ref = _cross_ref(field_rows, QUERY.split(), mode="and")[:50]
    assert _close(got, ref, tol=1e-6)
    # and-mode is a subset of or-mode with identical scores
    or_scores = dict(_pairs(multi_match(mf, QUERY, k=1000, boosts=boosts,
                                        combine="cross_fields")))
    for d, s in got:
        assert abs(or_scores[d] - s) < 1e-9


def test_cross_fields_rejects_similarity(mf):
    from hadoop_search_engine_spark.operators.multifield import multi_match

    with pytest.raises(ValueError, match="cross_fields"):
        multi_match(mf, QUERY, combine="cross_fields",
                    similarity="tfidf")


def test_concurrent_field_builds_identical(spark, tiny_corpus, mf,
                                           tmp_path):
    """concurrency=2 (the bench config) builds the same indexes as
    the sequential path: multi_match results identical."""
    out = str(tmp_path / "mfc")
    fields = {
        "title": F.array_join(F.slice(F.split(F.col("text"), " "),
                                      1, 8), " "),
        "body": F.array_join(
            F.slice(F.split(F.col("text"), " "), 9, 1 << 20), " "
        ),
    }
    mfc = build_multifield_index(spark, tiny_corpus, out, fields,
                                 concurrency=2, num_shards=4,
                                 n_buckets=8, block_size=16)
    a = _pairs(multi_match(mfc, QUERY, k=20,
                           boosts={"title": 3.0, "body": 1.0}))
    b = _pairs(multi_match(mf, QUERY, k=20,
                           boosts={"title": 3.0, "body": 1.0}))
    assert _close(a, b)
    assert len(a) > 0


# ---------------------------------------------------- combined_fields


def _py_combined_fields(rows, query_terms, weights, k1=K1, b=B):
    """rows: (doc_id, {field: text}); weights: {field: w}."""
    toks = {
        d: {f: tokenize(t) for f, t in by_field.items()}
        for d, by_field in rows
    }
    dlc = {
        d: sum(weights[f] * len(ts) for f, ts in by.items())
        for d, by in toks.items() if any(by.values())
    }
    n = len(dlc)
    avgdlc = sum(dlc.values()) / n
    scores = {}
    for t in query_terms:
        df = sum(
            1 for d, by in toks.items()
            if any(t in ts for ts in by.values())
        )
        if df == 0:
            continue
        w_idf = _idf(n, df)
        for d, by in toks.items():
            tfc = sum(weights[f] * ts.count(t) for f, ts in by.items())
            if tfc == 0:
                continue
            denom = tfc + k1 * (1 - b + b * dlc[d] / avgdlc)
            scores[d] = scores.get(d, 0.0) + w_idf * tfc * (k1 + 1) / denom
    return scores


def test_combined_fields_matches_python(spark, tiny_corpus):
    from hadoop_search_engine_spark.operators.multifield import (
        combined_fields_topk,
    )

    docs = tiny_corpus.select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
        .alias("title"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 9, 1 << 20),
                     " ").alias("body"),
    )
    weights = {"title": 3.0, "body": 1.0}
    got = [
        (r["doc_id"], r["score"])
        for r in combined_fields_topk(
            docs, QUERY, {"title": "title", "body": "body"},
            boosts=weights, k=15,
        ).collect()
    ]
    rows = [(r["doc_id"], {"title": r["title"], "body": r["body"]})
            for r in docs.collect()]
    ref = _py_combined_fields(rows, QUERY.split(), weights)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9
    # thin spread saturates ONCE: combined tf differs from multi_match
    with pytest.raises(ValueError, match=">= 1"):
        combined_fields_topk(docs, QUERY, {"title": "title"},
                             boosts={"title": 0.5})


def test_dsl_combined_fields_identity(spark, tiny_index, tiny_corpus):
    from hadoop_search_engine_spark.operators.dsl import search_dsl
    from hadoop_search_engine_spark.operators.multifield import (
        combined_fields_topk,
    )

    docs = tiny_corpus.select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
        .alias("title"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 9, 1 << 20),
                     " ").alias("body"),
    )
    got = search_dsl(
        tiny_index,
        {"query": {"combined_fields": {"query": QUERY,
                                       "fields": ["title^3", "body"]}},
         "size": 10},
        documents=docs,
    )
    want = combined_fields_topk(
        docs, QUERY, {"title": "title", "body": "body"},
        boosts={"title": 3.0, "body": 1.0}, k=10)
    assert got.hits.collect() == want.collect()
