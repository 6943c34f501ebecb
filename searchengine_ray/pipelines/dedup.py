"""Deduplication operators for large-scale corpus curation.

All stages are ``map_batches`` transforms plus ONE keyed shuffle each
(hash-partition groupby) — the canonical Ray Data dedup shapes:

- exact: content hash → ``groupby(hash)`` → keep min doc_id
- MinHash+LSH near-dup: shingle → 64 minhashes → band buckets →
  ``groupby(band, bucket)`` → candidate pairs → exact-Jaccard verify
- SimHash near-dup: 64-bit simhash → 4×16-bit band buckets → pairs with
  Hamming distance ≤ k

Hash families are fixed constants (derived once from a seeded
RandomState) so every run and every cluster size produces identical
output. Per-batch work is numpy-vectorized over all shingles of the
batch at once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import simple_tokens_flat

_MERSENNE = np.uint64((1 << 61) - 1)
_NUM_PERM = 64
_BANDS = 16          # r = 4 rows/band → ~Jaccard 0.5+ candidates
_ROWS = _NUM_PERM // _BANDS

_rs = np.random.RandomState(42)  # fixed → constants, not per-run randomness
_A = _rs.randint(1, (1 << 61) - 1, size=_NUM_PERM).astype(np.uint64)
_B = _rs.randint(0, (1 << 61) - 1, size=_NUM_PERM).astype(np.uint64)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_tokens(flat_terms: pa.Array) -> np.ndarray:
    """FNV-1a over token bytes → uint64 (vectorized over a padded byte
    matrix; loop bound = max token length, not token count)."""
    arr = flat_terms.to_pylist()
    if not arr:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8") for t in arr]
    maxlen = max(len(b) for b in bs)
    mat = np.zeros((len(bs), maxlen), dtype=np.uint8)
    lens = np.empty(len(bs), dtype=np.int64)
    for i, b in enumerate(bs):
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    h = np.full(len(bs), _FNV_OFFSET, dtype=np.uint64)
    for k in range(maxlen):
        active = lens > k
        h[active] = (h[active] ^ mat[active, k].astype(np.uint64)) * _FNV_PRIME
    return h


def _shingle_hashes(batch: pa.Table, k: int = 3):
    """Word k-gram shingle hashes per doc → list of (doc_id, uint64 set)."""
    flat, parents = simple_tokens_flat(batch["text"])
    th = _hash_tokens(flat)
    par = np.asarray(parents, dtype=np.int64)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    out = []
    # boundaries of each doc's token run (parents are nondecreasing)
    starts = np.searchsorted(par, np.arange(batch.num_rows), side="left")
    ends = np.searchsorted(par, np.arange(batch.num_rows), side="right")
    for row in range(batch.num_rows):
        h = th[starts[row]:ends[row]]
        if h.size < k:
            sh = np.unique(h)  # short doc: unigram fallback
        else:
            sh = h[: h.size - k + 1].copy()
            for j in range(1, k):
                sh = sh * np.uint64(1099511628211) + h[j : h.size - k + 1 + j]
            sh = np.unique(sh)
        out.append((int(doc_ids[row]), sh))
    return out


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 universal-hash minima over the shingle set."""
    if shingles.size == 0:
        return np.full(_NUM_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (P, S) = a*x + b mod mersenne — vectorized outer product
    prod = _A[:, None] * shingles[None, :] + _B[:, None]
    prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
    return prod.min(axis=1)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """(band, bucket, doc_id) rows — the LSH explode stage."""
    bands, buckets, docs = [], [], []
    for doc_id, sh in _shingle_hashes(batch):
        sig = minhash_signature(sh)
        for b in range(_BANDS):
            chunk = sig[b * _ROWS : (b + 1) * _ROWS]
            h = np.uint64(0xCBF29CE484222325)
            for v in chunk:
                h = (h ^ v) * _FNV_PRIME
            bands.append(b)
            buckets.append(int(h & np.uint64(0x7FFFFFFFFFFFFFFF)))
            docs.append(doc_id)
    return pa.table(
        {
            "band": pa.array(bands, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
        }
    )


def bucket_pairs_group(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """One LSH bucket → candidate pairs (doc_a < doc_b). Buckets larger
    than ``max_bucket`` are truncated to their smallest doc ids (logged
    via the ``truncated`` flag, no silent cap)."""
    docs = sorted(set(group["doc_id"].to_pylist()))
    truncated = len(docs) > max_bucket
    docs = docs[:max_bucket]
    a, b = [], []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a.append(docs[i])
            b.append(docs[j])
    return pa.table(
        {
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "truncated": pa.array([truncated] * len(a), pa.bool_()),
        }
    )


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the verify step after LSH)."""
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([text_a, text_b], pa.string())})
    (_, sa), (_, sb) = _shingle_hashes(t, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb).size
    union = np.union1d(sa, sb).size
    return inter / union if union else 0.0


# -- SimHash ---------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash:uint64-as-int64, band0..band3) — 64-bit SimHash
    over tf-weighted token hashes; 16-bit bands for Hamming≤3 blocking."""
    flat, parents = simple_tokens_flat(batch["text"])
    th = _hash_tokens(flat)
    par = np.asarray(parents, dtype=np.int64)
    n = batch.num_rows
    acc = np.zeros((n, 64), dtype=np.int64)
    if th.size:
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        contrib = bits * 2 - 1
        np.add.at(acc, par, contrib)
    sig = (acc > 0).astype(np.uint64)
    sh = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        sh |= sig[:, bit] << np.uint64(bit)
    cols = {
        "doc_id": batch["doc_id"],
        "simhash": pa.array(sh.astype(np.int64), pa.int64()),
    }
    for b in range(4):
        cols[f"band{b}"] = pa.array(
            ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64),
            pa.int64(),
        )
    return pa.table(cols)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.int64) ^ b.astype(np.int64)).astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# -- driver-level pipelines -----------------------------------------------

def exact_dedup(docs_ds):
    """→ Dataset (fingerprint, doc_id=min, n_dups) — hash-partition +
    per-group first (reference has no doc dedup; training-data op)."""
    from ray.data.aggregate import Count, Min

    from searchengine_ray.pipelines.analysis import fingerprint_batch

    fp = docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return (
        fp.groupby("fingerprint")
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_dups"))
    )


def minhash_candidates(docs_ds):
    """→ Dataset of distinct candidate pairs (doc_a, doc_b)."""
    bands = docs_ds.map_batches(minhash_bands_batch, batch_format="pyarrow")
    pairs = bands.groupby(["band", "bucket"]).map_groups(
        bucket_pairs_group, batch_format="pyarrow"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).select_columns(["doc_a", "doc_b"])


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """→ Dataset (doc_a, doc_b, hamming) near-dup pairs via band blocking."""
    sh = docs_ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_pairs(group: pa.Table) -> pa.Table:
        docs = group["doc_id"].to_numpy(zero_copy_only=False)
        sigs = group["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(docs)
        docs, sigs = docs[order], sigs[order]
        a, b, h = [], [], []
        for i in range(len(docs)):
            if i + 1 < len(docs):
                d = hamming64(np.repeat(sigs[i], len(docs) - i - 1),
                              sigs[i + 1:])
                for j, dist in zip(range(i + 1, len(docs)), d):
                    if dist <= max_hamming and docs[i] != docs[j]:
                        a.append(int(docs[i]))
                        b.append(int(docs[j]))
                        h.append(int(dist))
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(h, pa.int64())})

    out = []
    for band in range(4):
        out.append(
            sh.groupby(f"band{band}").map_groups(band_pairs,
                                                 batch_format="pyarrow")
        )
    pairs = out[0].union(*out[1:])
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
