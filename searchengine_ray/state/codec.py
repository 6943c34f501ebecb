"""Posting-list compression: delta-gap + variable-byte, skip pointers and
block-max metadata.

Design (new — the reference stores plain-text posting lists,
``spimi.py:230`` / ``frequency_posting_list.py:48-52``; compression here
follows the public IR literature: variable-byte coding per Scholer et al.
2002, block-max metadata per Ding & Suel 2011 "Faster top-k document
retrieval using block-max indexes").

Layout per term (columns of the shard Parquet, see merge.py):
- ``docs_enc: binary``  — delta-gapped doc_ids, varbyte
- ``tfs_enc: binary``   — term frequencies, varbyte
- ``dls_enc: binary``   — per-posting doc length, varbyte (self-contained
  BM25 scoring: no random docstats lookups at query time)
- ``skip_docs: list<int64>``  — first doc_id of each 128-posting block
- ``block_max_tf: list<int32>`` — max tf per block (query-time block-max
  bound: ``idf * (tf*(k+1))/(tf + k*(1-b)) >= any score in block``)

Varbyte convention: little-endian 7-bit groups; high bit (0x80) set on the
LAST byte of each value. All encode/decode paths are numpy-vectorized —
no per-posting Python loops (loop bound = max byte-width, <=10).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # postings per skip/block-max block


def vb_encode_raw(values: np.ndarray):
    """Varbyte-encode → (bytes, per-value byte-END offsets). The ends
    array lets callers slice the encoding per segment — one encode call
    for a whole shard group instead of one per posting list."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1
    ends = np.cumsum(nbits)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbits
    maxlen = int(nbits.max())
    rem = v.copy()
    for k in range(maxlen):
        mask = nbits > k
        idx = starts[mask] + k
        out[idx] = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
    out[ends - 1] |= 0x80
    return out.tobytes(), ends


def vb_encode_segmented(values: np.ndarray, seg_offsets: np.ndarray):
    """Encode once, slice per segment. ``seg_offsets`` = value-index
    boundaries (len = n_segments + 1). → list[bytes]."""
    buf, ends = vb_encode_raw(values)
    byte_bounds = np.concatenate(([0], ends))[seg_offsets]
    mv = memoryview(buf)
    return [bytes(mv[a:b]) for a, b in zip(byte_bounds[:-1], byte_bounds[1:])]


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a non-negative int array (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bit_length/7), minimum 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp >>= np.uint64(7)
    nbits[nbits == 0] = 1
    ends = np.cumsum(nbits)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbits
    maxlen = int(nbits.max())
    rem = v.copy()
    for k in range(maxlen):
        mask = nbits > k
        idx = starts[mask] + k
        out[idx] = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        rem = rem >> np.uint64(7)
    out[ends - 1] |= 0x80  # terminator bit on last byte of each value
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode varbyte bytes → int64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(b & 0x80) + 1
    starts = np.concatenate(([0], ends[:-1]))
    lengths = ends - starts
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    payload = (b & 0x7F).astype(np.uint64)
    for k in range(maxlen):
        mask = lengths > k
        vals[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return vals.astype(np.int64)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """Compress one term's postings (doc_ids must be ascending).

    Returns (docs_enc, tfs_enc, dls_enc, skip_docs, block_max_tf).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    docs_enc = vb_encode(delta_encode(doc_ids))
    tfs_enc = vb_encode(tfs)
    dls_enc = vb_encode(dls)
    skip_docs = doc_ids[::BLOCK].tolist()
    tfa = np.asarray(tfs, dtype=np.int64)
    nblocks = (tfa.size + BLOCK - 1) // BLOCK
    block_max = [int(tfa[i * BLOCK:(i + 1) * BLOCK].max()) for i in range(nblocks)]
    return docs_enc, tfs_enc, dls_enc, skip_docs, block_max


def decode_postings(docs_enc: bytes, tfs_enc: bytes, dls_enc: bytes):
    """→ (doc_ids, tfs, dls) int64 arrays."""
    doc_ids = delta_decode(vb_decode(docs_enc))
    tfs = vb_decode(tfs_enc)
    dls = vb_decode(dls_enc)
    return doc_ids, tfs, dls


def encode_positions(positions_per_doc: list) -> bytes:
    """Positional payload: per doc ``[n, gap1..gapn]`` varbyte, concatenated
    in doc order (positions are ascending within a doc by construction)."""
    chunks: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        chunks.append(np.asarray([p.size], dtype=np.int64))
        if p.size:
            chunks.append(delta_encode(p))
    if not chunks:
        return b""
    return vb_encode(np.concatenate(chunks))


def decode_positions(buf: bytes, n_docs: int) -> list:
    flat = vb_decode(buf)
    out = []
    i = 0
    for _ in range(n_docs):
        n = int(flat[i]); i += 1
        out.append(np.cumsum(flat[i:i + n]).tolist())
        i += n
    return out


def decode_positions_ragged(buf: bytes, n_docs: int,
                            lengths: np.ndarray | None = None):
    """→ (flat_abs_positions int64, lengths int64, starts int64) without
    building per-doc Python lists (the query hot path for positional
    scoring; ~10^5 docs per posting list).

    For positional postings the per-doc position count IS the stored tf
    (extract.py M7) — pass it as ``lengths`` and the whole decode is
    vectorized (the [n] headers are validated, not walked); without it,
    a per-doc loop recovers the counts from the headers."""
    vals = vb_decode(buf)
    if n_docs == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    if lengths is not None:
        lengths = np.asarray(lengths, dtype=np.int64)
        count_slots = np.concatenate(([0], np.cumsum(lengths + 1)[:-1]))
        if not np.array_equal(vals[count_slots], lengths):
            raise ValueError("positions payload does not match tfs")
    else:
        lengths = np.empty(n_docs, np.int64)
        idx = 0
        for d in range(n_docs):  # n_docs iterations — count slots only
            lengths[d] = vals[idx]
            idx += 1 + int(vals[idx])
        count_slots = np.concatenate(([0], np.cumsum(lengths + 1)[:-1]))
    mask = np.ones(vals.size, bool)
    mask[count_slots] = False
    gaps = vals[mask]
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    # segmented cumsum = global cumsum minus the prefix before each segment
    cs = np.cumsum(gaps)
    prefix = np.concatenate(([0], cs))
    flat = cs - np.repeat(prefix[starts], lengths)
    return flat.astype(np.int64), lengths, starts
