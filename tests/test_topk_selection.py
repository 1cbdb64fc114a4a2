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


def test_topk_pairs_pagination_property():
    """Hypothesis: for any scores/ids and any cursor drawn from the
    full ranking, _topk_pairs(after=cursor) returns exactly the next
    slice of the lexsort reference ranking."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from hadoop_search_engine_spark.operators.query_exec import _topk_pairs

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),
                st.sampled_from([0.0, 1.0, 1.5, 2.0, 2.5]),
            ),
            min_size=1, max_size=60,
        ),
        st.integers(min_value=1, max_value=7),
        st.data(),
    )
    def check(pairs, k, data):
        # unique doc ids (ranking is a total order over docs)
        seen = {}
        for d, s in pairs:
            seen[d] = s
        ids = np.array(sorted(seen), dtype=np.int64)
        scores = np.array([seen[d] for d in sorted(seen)], dtype=np.float64)
        order = np.lexsort((ids, -scores))
        ranking = [(int(ids[i]), float(scores[i])) for i in order]
        cut = data.draw(st.integers(min_value=0, max_value=len(ranking)))
        after = ranking[cut - 1] if cut > 0 else None
        got = _topk_pairs(ids, scores, k, after=after)
        assert got == ranking[cut : cut + k]

    check()
