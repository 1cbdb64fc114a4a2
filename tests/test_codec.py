import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_search_engine_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(arr), expected=len(vals))
    assert (out == arr).all()


@given(
    st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_doc_id_roundtrip(ids):
    arr = np.sort(np.array(list(ids), dtype=np.int64))
    base = int(arr[0])
    buf = codec.encode_doc_ids(arr, base=base)
    out = codec.decode_doc_ids(buf, n=len(arr), base=base)
    assert (out == arr).all()


def test_single_doc_df1():
    arr = np.array([42], dtype=np.int64)
    assert (codec.decode_doc_ids(codec.encode_doc_ids(arr), n=1) == arr).all()


def test_zero_gap_illegal():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 5], dtype=np.int64))


def test_unsorted_illegal():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 3], dtype=np.int64))


def test_below_base_illegal():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([3], dtype=np.int64), base=5)


def test_max_doc_id():
    arr = np.array([2**62, 2**63 - 1], dtype=np.int64)
    assert (codec.decode_doc_ids(codec.encode_doc_ids(arr), n=2) == arr).all()


def test_tf_one_is_single_zero_byte():
    assert codec.encode_tfs(np.array([1])) == b"\x00"
    assert (codec.decode_tfs(b"\x00", n=1) == np.array([1])).all()


def test_tf_nonpositive_illegal():
    with pytest.raises(ValueError):
        codec.encode_tfs(np.array([0]))


def test_truncated_stream_detected():
    with pytest.raises(ValueError):
        codec.varint_decode(b"\x80")  # continuation byte with no terminator


def test_compression_is_real():
    # dense ids with small gaps must encode ~1 byte per id, far below
    # the 8-byte raw representation
    ids = np.arange(1_000_000, 1_000_000 + 128 * 3, 3, dtype=np.int64)
    buf = codec.encode_doc_ids(ids, base=int(ids[0]))
    assert len(buf) < len(ids) * 2


def test_decode_blocks_batched_round_trip():
    """Batched multi-block decode == per-block decode, any block mix."""
    import numpy as np

    from hadoop_search_engine_spark.functions import codec

    rng = np.random.default_rng(7)
    blocks = []
    for base in [0, 1000, 131072, 9_999_999]:
        n = int(rng.integers(1, 200))
        ids = np.sort(rng.choice(np.arange(base, base + 100_000), n, replace=False))
        tfs = rng.integers(1, 50, n)
        blocks.append((ids, tfs, base))
    doc_bufs = [codec.encode_doc_ids(i, base=int(i[0])) for i, _, _ in blocks]
    tf_bufs = [codec.encode_tfs(t) for _, t, _ in blocks]
    ns = [len(i) for i, _, _ in blocks]
    bases = [int(i[0]) for i, _, _ in blocks]
    d, t, off = codec.decode_blocks(doc_bufs, tf_bufs, ns, bases)
    assert off.tolist() == [0] + list(np.cumsum(ns))
    for bi, (ids, tfs, _) in enumerate(blocks):
        got_d = d[off[bi]:off[bi + 1]]
        got_t = t[off[bi]:off[bi + 1]]
        assert (got_d == ids).all()
        assert (got_t == tfs).all()


def test_decode_blocks_empty():
    import numpy as np

    from hadoop_search_engine_spark.functions import codec

    d, t, off = codec.decode_blocks([], [], np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert d.size == 0 and t.size == 0 and off.tolist() == [0]


def test_positions_round_trip():
    import numpy as np

    from hadoop_search_engine_spark.functions import codec

    rng = np.random.default_rng(11)
    counts = rng.integers(1, 9, 20)
    pos_lists = [
        np.sort(rng.choice(np.arange(0, 400), c, replace=False)) for c in counts
    ]
    flat = np.concatenate(pos_lists)
    blob = codec.encode_positions(flat, counts)
    got = codec.decode_positions(blob, counts)
    assert (got == flat).all()
    # blobs concatenate: two blocks' blobs + combined counts decode fine
    b2 = codec.encode_positions(flat, counts)
    both = codec.decode_positions(blob + b2, np.concatenate([counts, counts]))
    assert (both == np.concatenate([flat, flat])).all()


def test_positions_reject_non_increasing():
    import numpy as np
    import pytest

    from hadoop_search_engine_spark.functions import codec

    with pytest.raises(ValueError):
        codec.encode_positions(np.array([3, 3]), np.array([2]))
