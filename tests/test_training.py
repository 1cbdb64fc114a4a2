"""Training-sequence assembly: chunking and concat-and-split packing
vs pure-Python references, plus the grouped / partition-invariance
contracts the 100 TB shape depends on."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.training import (
    chunk_docs,
    pack_spans,
    pack_text,
)

ROWS = [
    (0, "g0", "the fast spark query engine merges sorted runs"),
    (1, "g1", "one two three four five six seven eight nine ten"),
    (2, "g0", ""),  # empty doc: no chunks, occupies no pack tokens
    (3, "g1", "alpha beta"),
    (4, "g0", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (5, "g1", "solo"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, grp string, text string"
    ).repartition(3, "doc_id")


def _py_chunks(text, max_tokens, overlap):
    toks = tokenize(text)
    if not toks:
        return []
    step = max_tokens - overlap
    # a window whose fresh (non-overlap) region would be empty is skipped:
    # n_chunks = max(ceil((n - overlap) / step), 1)
    n_chunks = max(-(-(len(toks) - overlap) // step), 1)
    return [toks[i * step : i * step + max_tokens] for i in range(n_chunks)]


@pytest.mark.parametrize("max_tokens,overlap", [(4, 0), (5, 2), (64, 0)])
def test_chunk_docs_matches_python(docs, max_tokens, overlap):
    got = {}
    for r in chunk_docs(docs, max_tokens=max_tokens, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
        )
    for doc_id, _g, text in ROWS:
        want = _py_chunks(text, max_tokens, overlap)
        have = sorted(got.get(doc_id, []))
        assert len(have) == len(want), (doc_id, have, want)
        for (cid, n, ctext), w in zip(have, want):
            assert ctext == " ".join(w) and n == len(w)


def test_chunk_docs_every_token_covered_no_padding(docs):
    rows = chunk_docs(docs, max_tokens=4, overlap=1).collect()
    for r in rows:
        assert 1 <= r["n_tokens"] <= 4
    # overlap=0 chunks concatenate back to the exact token stream
    rows0 = chunk_docs(docs, max_tokens=4, overlap=0).collect()
    by_doc = {}
    for r in sorted(rows0, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).extend(r["chunk_text"].split(" "))
    for doc_id, _g, text in ROWS:
        assert by_doc.get(doc_id, []) == tokenize(text)


def test_chunk_docs_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_docs(docs, max_tokens=4, overlap=4)


def _py_pack(rows, seq_len):
    """Concat tokens in doc_id order, split every seq_len; also return
    the (doc_id, bin_id, bin_pos, tok_start, tok_end) span table."""
    stream, spans = [], []
    g = 0
    for doc_id, _grp, text in sorted(rows):
        toks = tokenize(text)
        if not toks:
            continue
        for j in range(len(toks)):
            pos = g + j
            b = pos // seq_len
            if not spans or tuple(spans[-1][0:2]) != (doc_id, b):
                spans.append([doc_id, b, pos % seq_len, j, j + 1])
            else:
                spans[-1][4] = j + 1
        stream.extend(toks)
        g += len(toks)
    bins = [
        stream[i : i + seq_len] for i in range(0, len(stream), seq_len)
    ]
    return bins, [tuple(s) for s in spans]


@pytest.mark.parametrize("seq_len", [4, 7, 1000])
def test_pack_matches_python(docs, seq_len):
    want_bins, want_spans = _py_pack(ROWS, seq_len)
    got_spans = sorted(
        (r["doc_id"], r["bin_id"], r["bin_pos"], r["tok_start"], r["tok_end"])
        for r in pack_spans(docs, seq_len).collect()
    )
    assert got_spans == sorted(want_spans)
    got_bins = {
        r["bin_id"]: (r["n_tokens"], r["text"])
        for r in pack_text(docs, seq_len).collect()
    }
    assert len(got_bins) == len(want_bins)
    for b, toks in enumerate(want_bins):
        assert got_bins[b] == (len(toks), " ".join(toks))
    # every bin full except possibly the last
    for b, (n, _t) in got_bins.items():
        assert n == seq_len or b == len(want_bins) - 1


def test_pack_grouped_equals_per_group(docs, spark):
    """group_col packs each group independently — identical to running
    the whole-corpus pack on each group's slice."""
    got = {}
    for r in pack_text(docs, 6, group_col="grp").collect():
        got.setdefault(r["grp"], {})[r["bin_id"]] = (r["n_tokens"], r["text"])
    for grp in ("g0", "g1"):
        sub = [r for r in ROWS if r[1] == grp]
        want_bins, _ = _py_pack(sub, 6)
        assert len(got[grp]) == len(want_bins)
        for b, toks in enumerate(want_bins):
            assert got[grp][b] == (len(toks), " ".join(toks))
    # spans carry the group key too
    sp = pack_spans(docs, 6, group_col="grp")
    assert sp.columns == ["grp", "doc_id", "bin_id", "bin_pos",
                          "tok_start", "tok_end"]


def test_pack_partition_invariant(docs, spark):
    a = sorted(map(tuple, pack_text(docs, 5).collect()))
    b = sorted(map(tuple, pack_text(docs.repartition(7), 5).collect()))
    assert a == b


def test_pack_rejects_bad_seq_len(docs):
    with pytest.raises(ValueError):
        pack_spans(docs, 0)


def test_bucketed_cumsum_identical_to_window_path(docs):
    """The parallel bucketed exclusive-cumsum (default) is arithmetic-
    identical to the single-window path — with a bucket width small
    enough that docs genuinely spread across several buckets, grouped
    and ungrouped."""
    for grp in (None, "grp"):
        for buckets in (2, 3, 1024):
            a = sorted(map(tuple, pack_spans(
                docs, 5, group_col=grp, cumsum_buckets=buckets).collect()))
            b = sorted(map(tuple, pack_spans(
                docs, 5, group_col=grp, cumsum_buckets=None).collect()))
            assert a == b, (grp, buckets)
    t_a = sorted(map(tuple, pack_text(docs, 6, cumsum_buckets=2).collect()))
    t_b = sorted(map(tuple, pack_text(docs, 6, cumsum_buckets=None).collect()))
    assert t_a == t_b


def test_bucketed_cumsum_partition_invariant_and_sparse_ids(spark):
    """Sparse, adversarially-spaced ids (all in one value bucket, then
    spread) still pack exactly like the dense python model."""
    rows = [(i, f"w{j} " * (i % 5 + 1)) for j, i in
            enumerate([3, 1_000_000, 7, 2**40, 11, 2**40 + 5])]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    ref = sorted(map(tuple, pack_spans(
        docs.coalesce(1), 4, cumsum_buckets=None).collect()))
    for parts in (2, 5):
        got = sorted(map(tuple, pack_spans(
            docs.repartition(parts), 4, cumsum_buckets=8).collect()))
        assert got == ref


# ------------------------------------------------- token budget cut


def _budget_corpus(spark, n=60):
    rows = [(i, " ".join(f"w{j}" for j in range((i % 7) + 2)))
            for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_budget_cut_prefix_semantics(spark):
    from hadoop_search_engine_spark.functions.hashes import mm3_u32_ref_str
    from hadoop_search_engine_spark.functions.tokenizer import tokenize
    from hadoop_search_engine_spark.operators.curate import (
        token_budget_cut,
    )

    docs = _budget_corpus(spark)
    budget = 80
    kept = token_budget_cut(docs, budget).collect()
    # reference: maximal prefix of the (murmur(id:salt), id) order
    rows = docs.collect()
    ordered = sorted(
        rows, key=lambda r: (mm3_u32_ref_str(str(r["doc_id"]),
                                             salt="budget"), r["doc_id"])
    )
    total, want = 0, []
    for r in ordered:
        n = len(tokenize(r["text"]))
        if total + n > budget:
            break
        total += n
        want.append((r["doc_id"], n))
    assert sorted(r["doc_id"] for r in kept) == sorted(d for d, _ in want)
    assert {r["doc_id"]: r["n_tokens"] for r in kept} == dict(want)
    assert sum(r["n_tokens"] for r in kept) <= budget


def test_token_budget_cut_nested_and_invariant(spark):
    from hadoop_search_engine_spark.operators.curate import (
        token_budget_cut,
    )

    docs = _budget_corpus(spark)
    small = {r["doc_id"] for r in token_budget_cut(docs, 50).collect()}
    big = {r["doc_id"] for r in token_budget_cut(docs, 150).collect()}
    assert small <= big  # prefix nesting
    repart = {
        r["doc_id"]
        for r in token_budget_cut(docs.repartition(7), 50).collect()
    }
    assert repart == small
    bucketed = {
        r["doc_id"]
        for r in token_budget_cut(docs, 50, order_buckets=4).collect()
    }
    assert bucketed == small  # bucket-count-invariant (prefix of key)


def test_token_budget_cut_validates(spark):
    import pytest

    from hadoop_search_engine_spark.operators.curate import (
        token_budget_cut,
    )

    docs = _budget_corpus(spark, n=4)
    with pytest.raises(ValueError):
        token_budget_cut(docs, -1)
    with pytest.raises(ValueError):
        token_budget_cut(docs, 10, order_buckets=3)
    assert token_budget_cut(docs, 0).count() == 0


def test_pack_manifest_boundaries_match_python(docs):
    from hadoop_search_engine_spark.operators.training import pack_manifest

    seq_len = 6
    _bins, spans = _py_pack(ROWS, seq_len)
    want: dict[int, list[tuple]] = {}
    for doc_id, b, bin_pos, s, e in spans:
        want.setdefault(b, []).append((bin_pos, doc_id, e - s))
    got = {r["bin_id"]: r for r in pack_manifest(docs, seq_len).collect()}
    assert set(got) == set(want)
    for b, entries in want.items():
        entries.sort()
        r = got[b]
        assert r["doc_ids"] == [d for _p, d, _n in entries]
        assert r["doc_starts"] == [p for p, _d, _n in entries]
        assert r["n_tokens"] == sum(n for _p, _d, n in entries)
    # joins with pack_text on bin_id: same bins, same token counts
    pt = {r["bin_id"]: r["n_tokens"]
          for r in pack_text(docs, seq_len).collect()}
    assert {b: got[b]["n_tokens"] for b in got} == pt
    # a spanning doc starts at position 0 of its continuation bin
    spanning = [r for r in got.values()
                if r["doc_starts"] and r["doc_starts"][0] == 0
                and len(r["doc_ids"]) >= 1]
    assert spanning  # doc 4 (26 tokens) must span bins
