"""Exact duplicate-span removal (Lee et al. 2022 keep-first
semantics): Spark output must equal a pure-Python reference that
implements the documented contract literally."""

from __future__ import annotations

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.dedup import (
    drop_duplicate_spans,
    duplicate_span_stats,
)

BOILER = "all rights reserved contact us for more info"
DOCS = [
    (0, f"unique zero alpha beta gamma delta {BOILER}"),
    (1, f"{BOILER} unique one epsilon zeta"),
    (2, f"unique two eta theta {BOILER} tail words here"),
    (3, "short doc"),  # < n tokens: untouched
    (4, BOILER),  # nothing but the shared span: dropped entirely
    # within-doc repeat: second copy of the repeated phrase removed
    (5, "repeat me now again soon repeat me now again soon trailing"),
    (6, "totally distinct text with no shared spans at all"),
]
N = 5


def _reference(rows, n):
    """Literal implementation of the documented semantics."""
    toks = {i: tokenize(t) for i, t in rows}
    occs = []  # (gram, doc, pos)
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            occs.append((tuple(ts[p:p + n]), i, p))
    by_gram: dict[tuple, list[tuple[int, int]]] = {}
    for g, i, p in occs:
        by_gram.setdefault(g, []).append((i, p))
    dup_occs = []
    for g, lst in by_gram.items():
        if len(lst) > 1:
            w = min(lst)
            dup_occs.extend(o for o in lst if o != w)
    stats = {}
    for i, ts in toks.items():
        total = max(len(ts) - n + 1, 0)
        ndup = sum(1 for (d, _p) in dup_occs if d == i)
        stats[i] = (total, ndup,
                    round(ndup / total, 6) if total else 0.0)
    covered: dict[int, set[int]] = {}
    for d, p in dup_occs:
        covered.setdefault(d, set()).update(range(p, p + n))
    rebuilt = {}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts)
                if p not in covered.get(i, set())]
        if kept:
            rebuilt[i] = " ".join(kept)
    return stats, rebuilt


def test_stats_match_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_ratio"])
        for r in duplicate_span_stats(df, n=N).collect()
    }
    stats, _ = _reference(DOCS, N)
    assert got == stats
    assert got[3] == (0, 0, 0.0)  # short doc
    assert got[6][1] == 0  # no shared spans


def test_drop_matches_reference_and_keeps_first(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_spans(df, n=N).collect()
    }
    _, rebuilt = _reference(DOCS, N)
    assert got == rebuilt
    # doc 0 is the lowest (doc_id, pos) owner of the boilerplate: kept
    assert BOILER in got[0]
    # docs 1 and 2 lose it
    assert BOILER not in got[1] and BOILER not in got[2]
    # doc 4 was nothing but the span: dropped
    assert 4 not in got
    # doc 5's within-doc second copy is removed, first copy kept
    assert got[5].count("repeat me now again soon") == 1
    # doc 3 short, doc 6 unique: byte-identical after token rebuild
    assert got[3] == "short doc"
    assert got[6] == DOCS[6][1]


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, drop_duplicate_spans(df, n=N).collect()))
    b = sorted(
        map(tuple, drop_duplicate_spans(df.repartition(5), n=N).collect())
    )
    assert a == b


def test_validates_n(spark):
    import pytest

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_span_stats(df, n=1)
    with pytest.raises(ValueError):
        drop_duplicate_spans(df, n=0)
