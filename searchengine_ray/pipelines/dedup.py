"""Deduplication operators for large-scale corpus curation.

All stages are ``map_batches`` transforms plus ONE keyed shuffle each
(hash-partition groupby) — the canonical Ray Data dedup shapes:

- exact: content hash → ``groupby(hash)`` → keep min doc_id
- MinHash+LSH near-dup: shingle → 64 minhashes → band buckets →
  ``groupby(band, bucket)`` → candidate pairs → exact-Jaccard verify
- SimHash near-dup: 64-bit simhash → 4×16-bit band buckets → pairs with
  Hamming distance ≤ k (pigeonhole: ≤3 differing bits over 4 bands
  always share a band, so band blocking loses nothing)

Hash families are fixed constants (derived once from a seeded
RandomState) so every run and every cluster size produces identical
output, and every step is reproducible in DuckDB SQL with HUGEINT
modular arithmetic (see __ray_entry__.oracle_sql: minhash_pairs /
simhash_pairs).

The hot path is FULLY segmented numpy over the Arrow buffers: token
hashing reads the utf-8 data buffer zero-copy, shingles/signatures/
bands are computed for the whole batch at once (``np.minimum.reduceat``
over doc segments) — no per-doc or per-token Python.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.pipelines.analysis import simple_tokens_flat

_LOG = logging.getLogger(__name__)

_MERSENNE = np.uint64((1 << 61) - 1)
_NUM_PERM = 64
_BANDS = 16          # r = 4 rows/band → ~Jaccard 0.5+ candidates
_ROWS = _NUM_PERM // _BANDS
_SHINGLE_K = 3

_rs = np.random.RandomState(42)  # fixed → constants, not per-run randomness
_A = _rs.randint(1, (1 << 61) - 1, size=_NUM_PERM).astype(np.uint64)
_B = _rs.randint(0, (1 << 61) - 1, size=_NUM_PERM).astype(np.uint64)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_SHINGLE_MULT = np.uint64(1099511628211)  # = FNV prime; k-gram combiner
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _hash_tokens(flat_terms) -> np.ndarray:
    """FNV-1a over each token's utf-8 bytes → uint64, vectorized: the
    Arrow string buffers are read zero-copy into a padded byte matrix
    via fancy indexing; the only loop is over max token LENGTH."""
    if isinstance(flat_terms, pa.ChunkedArray):
        flat_terms = flat_terms.combine_chunks()
    n = len(flat_terms)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = flat_terms.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(flat_terms.type) \
        else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        flat_terms.offset: flat_terms.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.full(n, _FNV_OFFSET, dtype=np.uint64)
    idx = starts[:, None] + np.arange(maxlen)[None, :]
    np.clip(idx, 0, len(data) - 1, out=idx)   # padded tail (masked below)
    mat = data[idx]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for k in range(maxlen):
        active = lens > k
        h[active] = (h[active] ^ mat[active, k].astype(np.uint64)) * _FNV_PRIME
    return h


def _shingle_arrays(batch: pa.Table, k: int = _SHINGLE_K):
    """Whole-batch word-k-gram shingling → segmented arrays:
    ``(doc_ids, shingle_values, seg_offsets)`` where
    ``shingle_values[seg_offsets[i]:seg_offsets[i+1]]`` is row i's
    DEDUPLICATED (sorted) shingle set. Docs with < k tokens fall back to
    unigram hashes (same semantics as round 1; SQL oracle mirrors it)."""
    flat, parents = simple_tokens_flat(batch["text"])
    th = _hash_tokens(flat)
    par = np.asarray(parents, dtype=np.int64)
    n = batch.num_rows
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    counts = np.bincount(par, minlength=n) if par.size else np.zeros(n, np.int64)
    doc_start = np.concatenate(([0], np.cumsum(counts)))
    total = th.size
    if total == 0:
        return doc_ids, np.empty(0, np.uint64), np.zeros(n + 1, np.int64)

    pos_in_doc = np.arange(total) - doc_start[par]
    big = counts[par] >= k                      # doc has a full window
    win = big & (pos_in_doc <= counts[par] - k)  # valid window starts
    wi = np.flatnonzero(win)
    sh_big = th[wi]
    for j in range(1, k):
        sh_big = sh_big * _SHINGLE_MULT + th[wi + j]
    si = np.flatnonzero(~big)                   # unigram fallback docs
    sh = np.concatenate([sh_big, th[si]])
    sh_doc = np.concatenate([par[wi], par[si]])

    # per-doc dedupe: sort by (doc, value), drop adjacent equals
    order = np.lexsort((sh, sh_doc))
    sh, sh_doc = sh[order], sh_doc[order]
    if sh.size:
        keep = np.empty(sh.size, dtype=bool)
        keep[0] = True
        keep[1:] = (sh_doc[1:] != sh_doc[:-1]) | (sh[1:] != sh[:-1])
        sh, sh_doc = sh[keep], sh_doc[keep]
    seg = np.concatenate(([0], np.cumsum(np.bincount(sh_doc, minlength=n))))
    return doc_ids, sh, seg.astype(np.int64)


def _shingle_hashes(batch: pa.Table, k: int = _SHINGLE_K):
    """Compat view of ``_shingle_arrays``: list of (doc_id, uint64 set)."""
    doc_ids, sh, seg = _shingle_arrays(batch, k)
    return [
        (int(doc_ids[i]), sh[seg[i]:seg[i + 1]])
        for i in range(len(doc_ids))
    ]


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 universal-hash minima over one shingle set (single-doc API;
    the batch path is ``_signatures_segmented``)."""
    if shingles.size == 0:
        return np.full(_NUM_PERM, _U64_MAX, dtype=np.uint64)
    prod = _A[:, None] * shingles[None, :] + _B[:, None]
    prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
    return prod.min(axis=1)


def _signatures_segmented(sh: np.ndarray, seg: np.ndarray,
                          perm_chunk: int = 16) -> np.ndarray:
    """All docs' signatures at once → (NUM_PERM, n_docs) uint64.
    ``np.minimum.reduceat`` over the doc segments; perms processed in
    chunks so the (chunk × shingles) matrix stays ~10s of MB."""
    n = seg.size - 1
    out = np.full((_NUM_PERM, n), _U64_MAX, dtype=np.uint64)
    if sh.size == 0 or n == 0:
        return out
    seg_sizes = np.diff(seg)
    nonempty = np.flatnonzero(seg_sizes > 0)
    if nonempty.size == 0:
        return out
    starts = seg[nonempty]
    for p0 in range(0, _NUM_PERM, perm_chunk):
        a = _A[p0:p0 + perm_chunk, None]
        b = _B[p0:p0 + perm_chunk, None]
        prod = a * sh[None, :] + b
        prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
        out[p0:p0 + perm_chunk, nonempty] = np.minimum.reduceat(
            prod, starts, axis=1
        )
    return out


def _band_buckets(sig: np.ndarray) -> np.ndarray:
    """(NUM_PERM, n) signatures → (BANDS, n) int64 bucket keys: FNV-1a
    fold of each band's ROWS values, sign bit masked (vectorized over
    docs; loop = 64 fold steps)."""
    n = sig.shape[1]
    buckets = np.empty((_BANDS, n), dtype=np.uint64)
    for band in range(_BANDS):
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        for r in range(_ROWS):
            h = (h ^ sig[band * _ROWS + r]) * _FNV_PRIME
        buckets[band] = h & np.uint64(0x7FFFFFFFFFFFFFFF)
    return buckets.astype(np.int64)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """(band, bucket, doc_id) rows — the LSH explode stage, one row per
    (doc, band), all segmented numpy. Rows are deliberately skinny (20
    bytes): the band-bucket groupby is the pipeline's one big all-to-all
    and its bytes scale linearly with the corpus, so nothing but the key
    and the doc id may ride through it."""
    doc_ids, sh, seg = _shingle_arrays(batch)
    sig = _signatures_segmented(sh, seg)
    buckets = _band_buckets(sig)                      # (BANDS, n)
    n = len(doc_ids)
    return pa.table(
        {
            "band": pa.array(
                np.repeat(np.arange(_BANDS, dtype=np.int32), n), pa.int32()
            ),
            "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            "doc_id": pa.array(
                np.tile(np.asarray(doc_ids, np.int64), _BANDS), pa.int64()
            ),
        }
    )


def bucket_pairs_block(batch: pa.Table, max_bucket: int = 200,
                       key_cols: tuple[str, str] = ("band", "bucket"),
                       id_col: str = "doc_id") -> pa.Table:
    """ALL buckets inside one sorted block → candidate pairs, with no
    per-group Python: group boundaries, the skew cap and the whole
    upper-triangle expansion are computed vectorized over the block.
    (A ``map_groups`` equivalent pays one Python call per bucket —
    with one bucket per (doc, band) row that is millions of calls per
    block and dominates the stage's CPU.)

    Requires every (band, bucket) group to live entirely in this block
    — exactly what a range-partitioned ``Dataset.sort`` on the key
    columns guarantees (identical keys never straddle a boundary).

    Buckets over ``max_bucket`` are truncated to their smallest doc
    ids — not silently: one warning per block reports how many buckets
    were capped and how many members were dropped, and every pair from
    a capped bucket carries ``trunc=1``."""
    n = batch.num_rows
    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "trunc": pa.array([], pa.int64()),
    })
    if n == 0:
        return empty
    band = batch[key_cols[0]].to_numpy(zero_copy_only=False)
    bucket = batch[key_cols[1]].to_numpy(zero_copy_only=False)
    doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, bucket, band))
    band, bucket, doc = band[order], bucket[order], doc[order]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1])
    gid = np.cumsum(new) - 1
    counts = np.bincount(gid)
    gstart0 = np.concatenate(([0], np.cumsum(counts)))
    over = counts > max_bucket
    if over.any():
        _LOG.warning(
            "LSH skew cap: %d buckets over max_bucket=%d in this block, "
            "%d member rows dropped (kept the smallest doc ids)",
            int(over.sum()), max_bucket,
            int((counts[over] - max_bucket).sum()),
        )
        pos = np.arange(n) - gstart0[:-1][gid]
        keep = pos < max_bucket
        gid, doc = gid[keep], doc[keep]
        counts = np.minimum(counts, max_bucket)
    m = counts.astype(np.int64)
    npairs = m * (m - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return empty
    pg = np.repeat(np.arange(m.size), npairs)       # group of each pair
    offs = np.concatenate(([0], np.cumsum(npairs)))
    k = np.arange(total, dtype=np.int64) - offs[pg]  # pair rank in group
    mm = m[pg]
    # rank k → upper-triangle (i, j), closed form (exact in float64:
    # m ≤ max_bucket keeps every operand far under 2^52)
    t = 2 * mm - 1
    i = ((t - np.sqrt(t.astype(np.float64) ** 2 - 8 * k)) // 2).astype(
        np.int64
    )
    j = k - i * (t - i) // 2 + i + 1
    gstart = np.concatenate(([0], np.cumsum(m)))
    return pa.table({
        "doc_a": pa.array(doc[gstart[pg] + i], pa.int64()),
        "doc_b": pa.array(doc[gstart[pg] + j], pa.int64()),
        "trunc": pa.array(over[pg].astype(np.int64), pa.int64()),
    })


def bucket_pairs_group(group: pa.Table, max_bucket: int = 200) -> pa.Table:
    """One LSH bucket → candidate pairs (doc_a < doc_b), vectorized
    upper-triangle. Buckets larger than ``max_bucket`` are truncated to
    their smallest doc ids — NOT silently: a warning names the bucket
    and the drop count, and every emitted pair carries ``truncated`` so
    downstream sees which candidates came out of a capped bucket.

    A pair that collides in several bands is emitted by each of them;
    ``distinct_pairs`` (a tiny pair-keyed aggregate) makes the union
    distinct. Emitting from every band — rather than a first-colliding-
    band claim — means a pair survives the cap as long as ANY band's
    bucket kept both members, so skew truncation in one band cannot
    silently lose a pair another band still saw."""
    raw = group["doc_id"].to_numpy(zero_copy_only=False)
    docs = np.unique(raw)
    truncated = docs.size > max_bucket
    if truncated:
        _LOG.warning(
            "LSH bucket over cap (band=%s bucket=%s): %d members, "
            "keeping %d smallest doc ids, dropping %d",
            group["band"][0].as_py() if "band" in group.column_names else "?",
            group["bucket"][0].as_py()
            if "bucket" in group.column_names else "?",
            docs.size, max_bucket, docs.size - max_bucket,
        )
        docs = docs[:max_bucket]
    iu, ju = np.triu_indices(docs.size, k=1)
    return pa.table(
        {
            "doc_a": pa.array(docs[iu], pa.int64()),
            "doc_b": pa.array(docs[ju], pa.int64()),
            "trunc": pa.array(
                np.full(iu.size, int(truncated), np.int64), pa.int64()
            ),
        }
    )


def distinct_pairs(pairs_ds):
    """(doc_a, doc_b, trunc) rows with per-band duplicates → distinct
    (doc_a, doc_b, truncated) pairs via ONE pair-keyed aggregate. The
    shuffle is tiny relative to the band-bucket exchange (candidate
    pairs only, pre-combined per block by the Min aggregate);
    ``truncated`` stays set only when EVERY band that saw the pair had
    a capped bucket — i.e. the pair is solid if any band kept it
    uncapped."""
    from ray.data.aggregate import Min

    agg = pairs_ds.groupby(["doc_a", "doc_b"]).aggregate(
        Min("trunc", alias_name="trunc")
    )

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_a": b["doc_a"].cast(pa.int64()),
            "doc_b": b["doc_b"].cast(pa.int64()),
            "truncated": pc.cast(
                pc.greater(b["trunc"].cast(pa.int64()), 0), pa.bool_()
            ),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


def exact_jaccard(text_a: str, text_b: str, k: int = _SHINGLE_K) -> float:
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


def _hamming_matrix(sigs: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances of uint64 signatures → (g, g) int64
    via byte-view unpackbits (vectorized popcount)."""
    x = sigs.astype(np.int64)[:, None] ^ sigs.astype(np.int64)[None, :]
    bytes_ = x.astype(np.uint64).view(np.uint8).reshape(x.shape[0],
                                                        x.shape[1], 8)
    return np.unpackbits(bytes_, axis=2).sum(axis=2).astype(np.int64)


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


def normalized_dedup(docs_ds):
    """→ Dataset (norm_fp, doc_id=min, n_dups): exact dedup over
    NORMALIZED text — lowercase, punctuation→space, whitespace
    collapsed, ends trimmed — the C4-style robustness layer that
    catches case/punctuation/whitespace re-encodings plain md5 dedup
    misses (and MinHash would call 1.0-similar anyway at shingle
    granularity). One RE2+md5 pass per batch, ONE keyed shuffle of
    (fp, doc_id) rows."""
    import hashlib

    from ray.data.aggregate import Count, Min

    def norm_fp(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b["text"])
        t = pc.replace_substring_regex(t, pattern=r"[^\w\s]",
                                       replacement=" ")
        t = pc.replace_substring_regex(t, pattern=r"\s+",
                                       replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        fp = [hashlib.md5(x.encode()).hexdigest()
              for x in t.to_pylist()]
        return pa.table({
            "norm_fp": pa.array(fp, pa.string()),
            "doc_id": b["doc_id"].cast(pa.int64()),
        })

    agg = docs_ds.map_batches(norm_fp, batch_format="pyarrow") \
        .groupby("norm_fp").aggregate(
            Min("doc_id", alias_name="doc_id"),
            Count(alias_name="n_dups"))

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "norm_fp": b["norm_fp"],
            "doc_id": b["doc_id"].cast(pa.int64()),
            "n_dups": b["n_dups"].cast(pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


def minhash_candidates(docs_ds, max_bucket: int = 200):
    """→ Dataset of distinct candidate pairs (doc_a, doc_b, truncated).
    Two shuffles, sized asymmetrically on purpose: the big one moves
    only skinny (band, bucket, doc_id) rows — no per-row signature
    payload — and the second moves only the candidate pairs themselves
    (pre-combined per block), which are vanishingly few next to the
    corpus. Carrying each doc's full bucket vector through the first
    shuffle to make pairs distinct without the second (the previous
    design) multiplies the all-to-all bytes by the band count and loses
    pairs whose first colliding band hit the skew cap."""
    bands = docs_ds.map_batches(minhash_bands_batch, batch_format="pyarrow")
    return candidates_from_bands(bands, max_bucket=max_bucket)


def candidates_from_bands(bands_ds, max_bucket: int = 200):
    """(band, bucket, doc_id) rows → distinct candidate pairs; the
    sort + vectorized per-block pairs + pair-dedup core shared by the
    MinHash path (and testable with synthetic band layouts). ``sort``
    range-partitions on the key, so each bucket lands whole in one
    block and ``bucket_pairs_block`` sees every member."""
    def pairs(batch: pa.Table) -> pa.Table:
        return bucket_pairs_block(batch, max_bucket=max_bucket)

    raw = bands_ds.sort(["band", "bucket"]).map_batches(
        pairs, batch_format="pyarrow"
    )
    return distinct_pairs(raw)


def simhash_explode_batch(batch: pa.Table) -> pa.Table:
    """simhash rows → one (band_id, band_value, doc_id, simhash) row per
    (doc, band) — the single-shuffle blocking layout (band values are
    recoverable from the simhash, so the group function can apply the
    first-colliding-band rule with no extra payload)."""
    t = simhash_batch(batch)
    n = t.num_rows
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sh = t["simhash"].to_numpy(zero_copy_only=False)
    bands = np.stack([t[f"band{b}"].to_numpy(zero_copy_only=False)
                      for b in range(4)])
    return pa.table({
        "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int32), n),
                            pa.int32()),
        "band_value": pa.array(bands.reshape(-1), pa.int64()),
        "doc_id": pa.array(np.tile(doc, 4), pa.int64()),
        "simhash": pa.array(np.tile(sh, 4), pa.int64()),
    })


def jaccard_verified_pairs(docs_ds, min_num: int = 1, min_den: int = 2):
    """N-gram-Jaccard dedup: MinHash-LSH candidates VERIFIED by exact
    word-3-gram Jaccard ≥ min_num/min_den. → Dataset (doc_a, doc_b,
    n_inter, n_union) — intersection/union sizes kept as INTEGERS so
    the threshold and the DuckDB oracle are rational-exact (no float
    rounding at the knife edge). Texts reach the verify stage through
    two hash joins (pairs are the small side; no full-corpus
    materialization)."""
    import ray.data

    from searchengine_ray.pipelines.similarity import autoscale_partitions

    nparts = autoscale_partitions()
    # materialize the (small) candidate side: a zero-candidate corpus
    # otherwise reaches the join as schemaless empty blocks and acero
    # cannot resolve the key fields (ADVICE r03) — short-circuit to a
    # typed empty result instead
    cand = minhash_candidates(docs_ds).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_inter": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
        }))
    da = docs_ds.map_batches(
        lambda b: pa.table({"jda": b["doc_id"], "text_a": b["text"]}),
        batch_format="pyarrow",
    )
    db = docs_ds.map_batches(
        lambda b: pa.table({"jdb": b["doc_id"], "text_b": b["text"]}),
        batch_format="pyarrow",
    )
    j = cand.join(da, join_type="inner", num_partitions=nparts,
                  on=("doc_a",), right_on=("jda",))
    # schemaless empty join partitions break the chained join's
    # aggregator (round-2 empty-block gotcha; a schema-restoring map
    # does not run on empty blocks) — repartition rebuilds typed blocks
    j = j.repartition(nparts)
    j = j.join(db, join_type="inner", num_partitions=nparts,
               on=("doc_b",), right_on=("jdb",))

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out_a, out_b, out_i, out_u = [], [], [], []
        if n:
            texts = pa.concat_arrays([
                b["text_a"].combine_chunks().cast(pa.string()),
                b["text_b"].combine_chunks().cast(pa.string()),
            ])
            t = pa.table({
                "doc_id": pa.array(np.arange(2 * n), pa.int64()),
                "text": texts,
            })
            _, sh, seg = _shingle_arrays(t)
            doc_a = b["doc_a"].to_numpy(zero_copy_only=False)
            doc_b = b["doc_b"].to_numpy(zero_copy_only=False)
            for i in range(n):
                sa = sh[seg[i]:seg[i + 1]]
                sb = sh[seg[n + i]:seg[n + i + 1]]
                inter = np.intersect1d(sa, sb).size
                union = sa.size + sb.size - inter
                if inter * min_den >= union * min_num:
                    out_a.append(int(doc_a[i]))
                    out_b.append(int(doc_b[i]))
                    out_i.append(inter)
                    out_u.append(union)
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "n_inter": pa.array(out_i, pa.int64()),
            "n_union": pa.array(out_u, pa.int64()),
        })

    return j.map_batches(verify, batch_format="pyarrow")


def simhash_pairs(docs_ds, max_hamming: int = 3, max_bucket: int = 1000):
    """→ Dataset (doc_a, doc_b, hamming) near-dup pairs via band
    blocking, ONE all-to-all (pairs unique by the first-colliding-band
    rule). Band groups larger than ``max_bucket`` are truncated to the
    smallest doc ids (skew guard — one degenerate 16-bit band value
    shared by n docs would otherwise cost O(n²) in a single group).
    Pigeonhole: hamming ≤ 3 over 4 bands guarantees ≥1 shared band, so
    (absent truncation) blocking loses no qualifying pair."""
    rows = docs_ds.map_batches(simhash_explode_batch, batch_format="pyarrow")

    def band_pairs(group: pa.Table) -> pa.Table:
        docs = group["doc_id"].to_numpy(zero_copy_only=False)
        sigs = group["simhash"].to_numpy(zero_copy_only=False)
        band = int(group["band_id"][0].as_py())
        order = np.argsort(docs)
        docs, sigs = docs[order], sigs[order]
        if docs.size > max_bucket:
            docs, sigs = docs[:max_bucket], sigs[:max_bucket]
        ham = _hamming_matrix(sigs)
        iu, ju = np.triu_indices(docs.size, k=1)
        hit = ham[iu, ju] <= max_hamming
        iu, ju = iu[hit], ju[hit]
        if iu.size:
            u = sigs.astype(np.uint64)
            bv = np.stack([((u >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                           for b in range(4)], axis=1).astype(np.int64)
            eq = bv[iu] == bv[ju]                     # (P, 4)
            keep = eq.argmax(axis=1) == band          # first colliding band
            iu, ju = iu[keep], ju[keep]
        return pa.table({"doc_a": pa.array(docs[iu], pa.int64()),
                         "doc_b": pa.array(docs[ju], pa.int64()),
                         "hamming": pa.array(ham[iu, ju], pa.int64())})

    return rows.groupby(["band_id", "band_value"]).map_groups(
        band_pairs, batch_format="pyarrow"
    )


def dedup_against(new_ds, existing_ds):
    """Incremental exact dedup: → Dataset (fingerprint, doc_id) — the
    NEW documents to keep, i.e. new docs whose md5 fingerprint appears
    nowhere in the EXISTING corpus, deduplicated within the new batch
    too (lowest doc_id wins) — the "dedupe today's crawl against the
    corpus we already have" operator.

    Scale shape: the existing corpus's fingerprints can be as large as
    the corpus itself (10^12 rows — no broadcast), so both sides are
    TAGGED and unioned into ONE fingerprint-keyed aggregate: per group,
    min new doc_id and whether any old member exists — Ray pre-combines
    per block (native Min aggregates, no per-group UDF), one all-to-all
    total. ``existing_ds`` may be the raw docs table (doc_id, text) or
    an already-persisted fingerprint table (fingerprint column)."""
    from ray.data.aggregate import Min

    from searchengine_ray.pipelines.analysis import fingerprint_batch

    def tag_new(b: pa.Table) -> pa.Table:
        t = fingerprint_batch(b)
        return pa.table({
            "fingerprint": t["fingerprint"],
            "new_doc": t["doc_id"].cast(pa.int64()),
            "is_old": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
        })

    def tag_old(b: pa.Table) -> pa.Table:
        t = fingerprint_batch(b) if "fingerprint" not in b.column_names \
            else b
        n = t.num_rows
        return pa.table({
            "fingerprint": t["fingerprint"],
            # sentinel: old rows never win the min-doc_id race
            "new_doc": pa.array(
                np.full(n, np.iinfo(np.int64).max, np.int64), pa.int64()),
            "is_old": pa.array(np.zeros(n, np.int64) - 1, pa.int64()),
        })

    tagged = new_ds.map_batches(tag_new, batch_format="pyarrow").union(
        existing_ds.map_batches(tag_old, batch_format="pyarrow"))
    agg = tagged.groupby("fingerprint").aggregate(
        Min("new_doc", alias_name="doc_id"),
        Min("is_old", alias_name="has_old"),   # min = -1 iff any old row
    )

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b["has_old"], 0),
            pc.not_equal(b["doc_id"], np.iinfo(np.int64).max),
        )
        b = b.filter(keep)
        return pa.table({
            "fingerprint": b["fingerprint"],
            "doc_id": b["doc_id"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
