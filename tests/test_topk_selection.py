"""_topk_pairs: O(n) selection must be bit-identical to the full sort.

The selection (argpartition score boundary + doc_id tie partition)
runs in every scorer — driver rows path AND executor shard tasks — so
a tie-handling slip would silently reorder results everywhere.
Hypothesis drives adversarial inputs: heavy score ties (few distinct
values), duplicate-free doc_ids, k at and beyond n.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_search_engine_spark.operators.query_exec import _topk_pairs


def _reference(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    order = np.lexsort((doc_ids, -scores))[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in order]


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=4000),
    n_distinct=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=1, max_value=50),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_topk_pairs_matches_full_sort(n, n_distinct, k, seed):
    rng = np.random.RandomState(seed)
    doc_ids = rng.permutation(n * 3)[:n].astype(np.int64)
    # few distinct scores -> huge tie groups at the k boundary
    palette = rng.rand(n_distinct)
    scores = palette[rng.randint(0, n_distinct, size=n)]
    assert _topk_pairs(doc_ids, scores, k) == _reference(doc_ids, scores, k)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=65, max_value=2000),
    k=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_topk_pairs_all_scores_equal(n, k, seed):
    # the worst tie case: every score identical -> selection must be
    # exactly the k smallest doc_ids
    rng = np.random.RandomState(seed)
    doc_ids = rng.permutation(n * 2)[:n].astype(np.int64)
    scores = np.full(n, 0.5)
    got = _topk_pairs(doc_ids, scores, k)
    want = [(int(d), 0.5) for d in np.sort(doc_ids)[:k]]
    assert got == want
