"""Posting-list codec: varbyte/delta/positions round-trips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.state.codec import (
    BLOCK,
    decode_positions,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_postings,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 255, 300, 2**20, 2**40], dtype=np.int64)
    assert vb_decode(vb_encode(vals)).tolist() == vals.tolist()


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.int64)) == b""
    assert vb_decode(b"").tolist() == []


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert vb_decode(vb_encode(arr)).tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.int64))
    assert delta_decode(delta_encode(arr)).tolist() == arr.tolist()


def test_encode_postings_roundtrip_and_blockmax():
    n = 300
    doc_ids = np.arange(0, 5 * n, 5, dtype=np.int64)
    tfs = (np.arange(n) % 7 + 1).astype(np.int64)
    dls = (np.arange(n) % 50 + 10).astype(np.int64)
    docs_enc, tfs_enc, dls_enc, skip_docs, block_max = encode_postings(
        doc_ids, tfs, dls
    )
    d, t, l = decode_postings(docs_enc, tfs_enc, dls_enc)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()
    assert skip_docs == doc_ids[::BLOCK].tolist()
    assert len(block_max) == (n + BLOCK - 1) // BLOCK
    assert block_max[0] == int(tfs[:BLOCK].max())


def test_positions_roundtrip():
    pos = [[0, 3, 9], [], [5], [1, 2, 3, 4, 100]]
    buf = encode_positions(pos)
    assert decode_positions(buf, len(pos)) == pos


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), max_size=20),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip_property(pos):
    pos = [sorted(p) for p in pos]
    assert decode_positions(encode_positions(pos), len(pos)) == pos


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), max_size=20),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_ragged_equals_lists(pos):
    from searchengine_ray.state.codec import decode_positions_ragged

    pos = [sorted(p) for p in pos]
    buf = encode_positions(pos)
    flat, lengths, starts = decode_positions_ragged(buf, len(pos))
    rebuilt = [flat[s:s + n].tolist() for s, n in zip(starts, lengths)]
    assert rebuilt == pos
