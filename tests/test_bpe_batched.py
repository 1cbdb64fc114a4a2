"""Round-4 batched BPE: the spark path's safe-batch selection must
reproduce the sequential merge sequence EXACTLY (that is the whole
contract — see operators/bpe.py select_merge_batch), while cutting
rounds (Spark jobs) far below merges.

The fuzz here runs a pure-Python twin of the distributed loop (same
selection function, same one-pass batch fold semantics) against the
textbook sequential trainer over hundreds of random corpora — cheap
enough to hammer; the Spark-vs-driver identity test in test_bpe.py
covers the JVM fold itself.
"""

from __future__ import annotations

import random

import pytest

from hadoop_search_engine_spark.operators.bpe import (
    _sym_init,
    _train_driver,
    merge_word,
    select_merge_batch,
)


def _apply_batch_py(
    syms: tuple[str, ...], mapping: dict[tuple[str, str], str]
) -> tuple[str, ...]:
    """Python twin of _batch_merge_fold: one left-to-right pass,
    merging any adjacent pair present in the batch map."""
    out: list[str] = []
    for s in syms:
        if out and (out[-1], s) in mapping:
            out[-1] = mapping[(out[-1], s)]
        else:
            out.append(s)
    return tuple(out)


def _train_batched_py(
    vocab: dict[tuple[str, ...], int],
    n_merges: int,
    min_pair_count: int,
    window: int = 4096,
    max_batch: int = 1024,
) -> tuple[list[tuple[int, str, str, int]], int]:
    """The distributed loop's logic, driver-side: returns (merges,
    n_rounds) where each round is one pair-count + one batch apply —
    the per-round Spark job cost in bpe_train(mode='spark')."""
    known = {s for syms in vocab for s in syms}
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        ordered = sorted(
            ((a, b, c) for (a, b), c in pairs.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[:window]
        if not ordered or ordered[0][2] < min_pair_count:
            break
        batch = select_merge_batch(
            ordered,
            known,
            min_pair_count,
            limit=min(n_merges - len(merges), max_batch),
            saw_all=len(ordered) < window,
        )
        rounds += 1
        mapping = {(a, b): a + b for a, b, _ in batch}
        for a, b, c in batch:
            merges.append((len(merges), a, b, c))
            known.add(a + b)
        new: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            ns = _apply_batch_py(syms, mapping)
            new[ns] = new.get(ns, 0) + c
        vocab = new
    return merges, rounds


def _random_vocab(rng: random.Random) -> dict[tuple[str, ...], int]:
    alphabet = "abcd"[: rng.randint(2, 4)]
    vocab: dict[tuple[str, ...], int] = {}
    for _ in range(rng.randint(3, 25)):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        vocab[_sym_init(w)] = vocab.get(_sym_init(w), 0) + rng.randint(1, 40)
    return vocab


@pytest.mark.parametrize("seed", range(60))
def test_batched_equals_sequential_fuzz(seed):
    """Small alphabets + short words maximize interaction density and
    cat-collisions (e.g. merging (a,b) while symbol 'ab' exists) —
    the adversarial regime for batch selection."""
    rng = random.Random(seed)
    vocab = _random_vocab(rng)
    n_merges = rng.randint(1, 40)
    mpc = rng.choice([1, 2, 3])
    want = _train_driver(dict(vocab), n_merges, mpc)
    got, _rounds = _train_batched_py(dict(vocab), n_merges, mpc)
    assert got == want, f"seed={seed} vocab={vocab}"


@pytest.mark.parametrize("seed", range(10))
def test_batched_equals_sequential_tiny_window(seed):
    """A pathologically small collect window (the unseen-tail stopper
    path of select_merge_batch) must stay exact too."""
    rng = random.Random(1000 + seed)
    vocab = _random_vocab(rng)
    want = _train_driver(dict(vocab), 30, 1)
    got, _ = _train_batched_py(dict(vocab), 30, 1, window=3)
    assert got == want


def test_batching_is_sublinear_on_natural_text():
    """The point of the rework: merges per round >> 1 on realistic
    word-count shapes. English-like text, 200 merges."""
    text_words = (
        "the quick brown fox jumps over the lazy dog while the dog "
        "sleeps under the warm summer sun and the fox runs through "
        "the quiet forest looking for berries water shelter and rest "
        "every single evening before the moon rises over the hills"
    ).split()
    rng = random.Random(7)
    vocab: dict[tuple[str, ...], int] = {}
    for w in text_words:
        vocab[_sym_init(w)] = vocab.get(_sym_init(w), 0) + rng.randint(1, 500)
    want = _train_driver(dict(vocab), 200, 1)
    got, rounds = _train_batched_py(dict(vocab), 200, 1)
    assert got == want
    assert len(got) > 50
    # exact mode batches where it can (measured ~1.3-2.5x on text this
    # small — sequential fidelity caps batches at the first
    # interacting pair; the real scale lever is batching="greedy",
    # see test_greedy_rounds_are_tiny)
    assert rounds < len(got), (rounds, len(got))


def test_select_merge_batch_head_always_selected():
    # head with cat-collision runs alone
    out = select_merge_batch(
        [("a", "b", 10), ("c", "d", 9)], {"ab"}, 1, 10, True
    )
    assert out == [("a", "b", 10)]
    # interacting second pair stops the batch; truncation to > c_stop
    out2 = select_merge_batch(
        [("a", "b", 10), ("x", "y", 9), ("b", "c", 9)], set(), 1, 10, True
    )
    assert out2 == [("a", "b", 10)]  # (x,y)==9 not > c_stop==9
    out3 = select_merge_batch(
        [("a", "b", 10), ("x", "y", 9), ("b", "c", 8)], set(), 1, 10, True
    )
    assert out3 == [("a", "b", 10), ("x", "y", 9)]


def test_spark_batched_identity_and_round_count(spark):
    """End-to-end on Spark: batched mode == driver mode on a corpus
    engineered with many non-interacting frequent pairs, and the
    number of pair-count jobs (rounds) is far below n_merges."""
    from hadoop_search_engine_spark.operators.bpe import bpe_train

    rows = []
    base = [
        "alpha beta gamma delta", "epsilon zeta eta theta",
        "iota kappa lambda mu", "nu xi omicron pi",
        "rho sigma tau upsilon", "phi chi psi omega",
    ]
    for i in range(120):
        rows.append((i, base[i % len(base)] + f" word{i % 13}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = [tuple(r) for r in bpe_train(docs, n_merges=60, mode="driver",
                                        min_pair_count=1).collect()]
    got = [tuple(r) for r in bpe_train(docs, n_merges=60, mode="spark",
                                       min_pair_count=1).collect()]
    assert got == want
    assert len(got) == 60


def test_greedy_driver_equals_greedy_spark(spark):
    """batching='greedy' (batch BPE, the 32k-vocab scale path) is
    deterministic and identical across driver and spark
    implementations."""
    from hadoop_search_engine_spark.operators.bpe import bpe_train

    rows = []
    base = [
        "the quick brown fox", "jumps over the lazy dog",
        "pack my box with five dozen", "liquor jugs and towels",
    ]
    for i in range(80):
        rows.append((i, base[i % len(base)] + f" tail{i % 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = [tuple(r) for r in bpe_train(
        docs, n_merges=50, mode="driver", batching="greedy",
        min_pair_count=1).collect()]
    got = [tuple(r) for r in bpe_train(
        docs, n_merges=50, mode="spark", batching="greedy",
        min_pair_count=1).collect()]
    assert got == want and len(got) == 50


def test_greedy_rounds_are_tiny():
    """The scale claim, measured: 2000 merges on a 20k-word Zipf
    vocabulary in <= 10 rounds (each round == one pair-count Spark
    job in mode='spark')."""
    from hadoop_search_engine_spark.operators.bpe import (
        _train_driver_batched,
    )

    rng = random.Random(42)
    letters = "etaoinshrdlucmfwypvbgkjqxz"
    weights = [12, 9, 8, 8, 7, 7, 6, 6, 6, 4, 4, 3, 3, 3, 2, 2, 2, 2,
               1, 1, 1, 1, 1, 1, 1, 1]
    vocab: dict[tuple[str, ...], int] = {}
    for i in range(20000):
        length = rng.randint(2, 12)
        w = "".join(rng.choices(letters, weights=weights, k=length))
        c = max(1, int(50000 / (i + 1)))
        k = _sym_init(w)
        vocab[k] = vocab.get(k, 0) + c
    merges, rounds = _train_driver_batched(vocab, 2000, 1, 4096, 1024)
    assert len(merges) == 2000
    assert rounds <= 10, rounds  # measured: 3
    # every merge was a real pair with a positive snapshot count and
    # ranks are dense
    assert [m[0] for m in merges] == list(range(2000))
    assert all(m[3] >= 1 for m in merges)


def test_greedy_encode_round_trip(spark):
    """A greedy-trained table still drives the encoder: subwords
    reconstruct every word exactly (byte-loss invariant)."""
    from hadoop_search_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=30, mode="driver",
                       batching="greedy", min_pair_count=1)
    enc = bpe_encode(docs, merges).collect()
    text_tokens = "alpha beta gamma delta".split() * 3
    for r in enc:
        rebuilt = [w for w in "".join(r["bpe_tokens"]).split("</w>") if w]
        assert rebuilt == text_tokens


def test_bpe_train_rejects_bad_batching(spark):
    from hadoop_search_engine_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="batching"):
        bpe_train(docs, batching="nope")
