"""BPE vocab induction: hand-checked Sennrich-style fixture, the
driver==spark identity, the reconstruction invariant, and the
determinism contracts."""

from __future__ import annotations

import pytest

from hadoop_search_engine_spark.functions.tokenizer import tokenize
from hadoop_search_engine_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
    merge_word,
    word_counts,
)

# the classic fixture: low x5, lower x2, newest x6, widest x3
SENNRICH_ROWS = [
    (0, "low low low"),
    (1, "low low lower"),
    (2, "lower newest newest newest"),
    (3, "newest newest newest widest"),
    (4, "widest widest"),
]

# hand-derived with </w> attached to the final char; ties broken by
# (count desc, left asc, right asc)
SENNRICH_MERGES = [
    (0, "e", "s", 9),
    (1, "es", "t</w>", 9),
    (2, "l", "o", 7),
    (3, "e", "w", 6),
    (4, "ew", "est</w>", 6),
    (5, "n", "ewest</w>", 6),
]


@pytest.fixture(scope="module")
def sennrich(spark):
    return spark.createDataFrame(
        SENNRICH_ROWS, "doc_id long, text string"
    ).repartition(3)


def test_merge_word_non_overlapping():
    assert merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert merge_word(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    assert merge_word(("x", "a", "b", "a", "b"), "a", "b") == (
        "x", "ab", "ab")
    assert merge_word(("a", "b"), "b", "a") == ("a", "b")


@pytest.mark.parametrize("mode", ["driver", "spark"])
def test_bpe_train_sennrich_fixture(sennrich, mode):
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(sennrich, n_merges=6, mode=mode)
        .orderBy("rank").collect()
    ]
    assert got == SENNRICH_MERGES


def test_bpe_train_spark_equals_driver_and_partition_invariant(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}ab c{(j % 5)}xy zq{i % 3}"
                      for j in range(6)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(
        docs, n_merges=25, mode="driver").orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_train(
        docs.repartition(7), n_merges=25, mode="spark",
        checkpoint_interval=3).orderBy("rank").collect()]
    assert a == b
    assert len(a) == 25


def test_bpe_train_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string")
    got = bpe_train(docs, n_merges=50, min_pair_count=2,
                    mode="driver").collect()
    assert got == []  # every pair occurs once


def test_encode_word_uses_merge_rank_not_position():
    # ranks: (b,c)=0 then (a,bc)=1 — positional left-most would pick
    # (a,b) first if it existed; rank order must win
    ranks = {("b", "c" + END): 0, ("a", "bc" + END): 1}
    assert encode_word("abc", ranks) == ("abc" + END,)
    assert encode_word("", ranks) == ()


def test_bpe_encode_reconstruction_invariant(sennrich, spark):
    merges = bpe_train(sennrich, n_merges=6, mode="driver")
    enc = {r["doc_id"]: r for r in
           bpe_encode(sennrich, merges).collect()}
    for doc_id, text in SENNRICH_ROWS:
        toks = tokenize(text)
        subs = list(enc[doc_id]["bpe_tokens"])
        assert enc[doc_id]["n_bpe_tokens"] == len(subs)
        # greedily re-split the subword stream back into words
        for w in toks:
            target = w + END
            acc = ""
            while acc != target:
                assert subs, (w, acc)
                acc += subs.pop(0)
            assert acc == target
        assert subs == []


def test_bpe_encode_token_count_monotone_in_merges(sennrich):
    n_chars = bpe_encode(
        sennrich, bpe_train(sennrich, n_merges=0, mode="driver")
    ).agg({"n_bpe_tokens": "sum"}).first()[0]
    n_six = bpe_encode(
        sennrich, bpe_train(sennrich, n_merges=6, mode="driver")
    ).agg({"n_bpe_tokens": "sum"}).first()[0]
    n_words = sum(len(tokenize(t)) for _i, t in SENNRICH_ROWS)
    assert n_chars > n_six >= n_words
    # 6 merges fully fuse "newest": its 9 occurrences are 1 token each
    enc3 = dict(
        (r["doc_id"], list(r["bpe_tokens"]))
        for r in bpe_encode(
            sennrich, bpe_train(sennrich, n_merges=6, mode="driver")
        ).collect()
    )
    assert "newest" + END in enc3[2]


def test_word_counts(sennrich):
    wc = {r["word"]: r["cnt"] for r in word_counts(sennrich).collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_train_rejects_bad_mode(sennrich):
    with pytest.raises(ValueError, match="mode"):
        bpe_train(sennrich, mode="gpu")
