"""Shard-backed posting-list access for the query engine.

Replaces the reference's random-access-file binary search over sorted
text lines (``index.py:93-159`` — incl. defects D1/D2, not replicated)
with parquet predicate pushdown: each shard file is sorted by term and
written with small row groups, so a ``term IN (...)`` filter prunes to
the row groups actually containing the query terms. Fetched lists are
decoded once and kept in an LRU cache (the reference's posting-list
cache, ST5 ``index.py:157-158``).
"""

from __future__ import annotations

import bisect
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
import pyarrow.parquet as pq

from searchengine_ray.state.codec import (
    decode_positions_ragged,
    decode_postings,
)


class RaggedPositions:
    """Lazy per-doc view over flat position arrays — indexing/iteration
    yield Python lists (reference-shaped), while vectorized scorers use
    the flat arrays directly."""

    __slots__ = ("flat", "lengths", "starts")

    def __init__(self, flat, lengths, starts):
        self.flat = flat
        self.lengths = lengths
        self.starts = starts

    def __len__(self):
        return self.lengths.size

    def __getitem__(self, i):
        s = self.starts[i]
        return self.flat[s:s + self.lengths[i]].tolist()

    def __iter__(self):
        for i in range(self.lengths.size):
            yield self[i]


class LazyEncodedPositions:
    """Positions of one shard row kept ENCODED until someone asks: the
    varbyte blob's per-value byte boundaries are recoverable without
    decoding (the 0x80 terminator bit), and the per-doc value counts
    are the tfs — so a pruned boost evaluation decodes only its ~top-n
    candidate docs' byte ranges instead of the whole ~10^5-doc payload
    (the round-2 cold-positional cost was exactly this eager decode)."""

    __slots__ = ("buf", "lengths", "count_slots", "_ends")

    def __init__(self, buf: bytes, lengths: np.ndarray):
        self.buf = buf
        self.lengths = np.asarray(lengths, dtype=np.int64)
        # value-slot layout per doc d: [count, gap1..gap_tf]
        self.count_slots = np.concatenate(
            ([0], np.cumsum(self.lengths + 1)[:-1])
        )
        self._ends = None

    def _value_ends(self) -> np.ndarray:
        if self._ends is None:
            b = np.frombuffer(self.buf, dtype=np.uint8)
            self._ends = np.flatnonzero(b & 0x80).astype(np.int64) + 1
        return self._ends

    def slices(self, rows: np.ndarray):
        """→ (flat_abs_positions, lengths, starts) for the given doc
        rows, in input order — decodes only those rows' bytes."""
        from searchengine_ray.state.codec import vb_decode

        rows = np.asarray(rows, dtype=np.int64)
        len_sel = self.lengths[rows]
        start_sel = np.concatenate(([0], np.cumsum(len_sel)[:-1]))
        total = int(len_sel.sum())
        if total == 0:
            return (np.empty(0, np.int64), len_sel,
                    np.zeros(rows.size, np.int64))
        ends = self._value_ends()
        bstarts = np.concatenate(([0], ends[:-1]))
        nz = len_sel > 0
        # byte range of row r's gap values: skip its count slot
        b0 = bstarts[self.count_slots[rows[nz]] + 1]
        b1 = ends[self.count_slots[rows[nz]] + len_sel[nz]]
        blens = b1 - b0
        tot_b = int(blens.sum())
        # segmented byte gather → one small vb_decode
        rep_off = np.repeat(np.concatenate(([0], np.cumsum(blens)[:-1])),
                            blens)
        src = np.repeat(b0, blens) + (np.arange(tot_b) - rep_off)
        buf_np = np.frombuffer(self.buf, dtype=np.uint8)
        gaps = vb_decode(buf_np[src].tobytes())
        # segmented cumsum back to absolute positions
        cs = np.cumsum(gaps)
        prefix = np.concatenate(([0], cs))
        flat = cs - np.repeat(prefix[start_sel], len_sel)
        return flat.astype(np.int64), len_sel, start_sel

    def materialize(self) -> "RaggedPositions":
        f, ln, st = self.slices(np.arange(self.lengths.size))
        return RaggedPositions(f, ln, st)


class LazySaltedPositions:
    """Positions of a salted (merged) term WITHOUT the up-front gather:
    per-salt ragged arrays plus each merged row's (salt, within-salt
    row). ``slices(rows)`` gathers only the requested rows' positions —
    with boost pruning, the query path touches a few hundred docs of a
    ~10^5-doc posting list, so the full merge (the round-1 cold-query
    cost) never happens. ``materialize()`` still builds the full merged
    view for the reference-shaped per-doc API."""

    __slots__ = ("salt_rags", "src_salt", "src_idx", "lengths")

    def __init__(self, salt_rags, src_salt, src_idx, lengths):
        self.salt_rags = salt_rags     # list of (flat, len, start) per salt
        self.src_salt = src_salt       # (n,) int8/int32: salt of merged row
        self.src_idx = src_idx         # (n,) int64: row within its salt
        self.lengths = lengths         # (n,) merged per-doc counts (== tfs)

    def slices(self, rows: np.ndarray):
        """→ (flat_sel, len_sel, start_sel) for the given merged-row
        indices, in input order. Salt payloads may be still-encoded
        (``LazyEncodedPositions``) — then each salt decodes exactly the
        requested rows' bytes."""
        rows = np.asarray(rows, dtype=np.int64)
        len_sel = self.lengths[rows]
        start_sel = np.concatenate(([0], np.cumsum(len_sel)[:-1]))
        total = int(len_sel.sum())
        flat_sel = np.empty(total, np.int64)
        salts = self.src_salt[rows]
        for r in np.unique(salts):
            m = np.flatnonzero(salts == r)
            rag = self.salt_rags[r]
            src = self.src_idx[rows[m]]
            if isinstance(rag, LazyEncodedPositions):
                f_r, lens_r, _ = rag.slices(src)   # already in src order
                tot_r = int(lens_r.sum())
                if tot_r == 0:
                    continue
                out_pos = np.repeat(start_sel[m], lens_r) + (
                    np.arange(tot_r)
                    - np.repeat(
                        np.concatenate(([0], np.cumsum(lens_r)[:-1])),
                        lens_r)
                )
                flat_sel[out_pos] = f_r
                continue
            f, ln, st = rag
            lens_r = ln[src]
            tot_r = int(lens_r.sum())
            if tot_r == 0:
                continue
            # segmented gather from the salt's flat array
            out_pos = np.repeat(start_sel[m], lens_r) + (
                np.arange(tot_r)
                - np.repeat(np.concatenate(([0], np.cumsum(lens_r)[:-1])),
                            lens_r)
            )
            src_pos = np.repeat(st[src], lens_r) + (
                np.arange(tot_r)
                - np.repeat(np.concatenate(([0], np.cumsum(lens_r)[:-1])),
                            lens_r)
            )
            flat_sel[out_pos] = f[src_pos]
        return flat_sel, len_sel, start_sel

    def materialize(self) -> "RaggedPositions":
        flat, lengths, starts = self.slices(np.arange(self.lengths.size))
        return RaggedPositions(flat, lengths, starts)


@dataclass
class PostingsRec:
    """One term's decoded posting list (doc_ids ascending)."""

    term: str
    df: int
    idf: float
    doc_ids: np.ndarray
    tfs: np.ndarray
    dls: np.ndarray
    weights: np.ndarray | None = None
    positions: list | None = None
    block_max_tf: list | None = None   # per-128-posting max tf (WAND)
    _pos_of: dict | None = field(default=None, repr=False)
    # per-query-engine caches (filled by scorers; keyed to one index's
    # avgdl so safe to store on the record)
    _tfs64: np.ndarray | None = field(default=None, repr=False)
    _dldiv: np.ndarray | None = field(default=None, repr=False)
    _contrib: np.ndarray | None = field(default=None, repr=False)

    def tfs_f64(self) -> np.ndarray:
        if self._tfs64 is None:
            self._tfs64 = self.tfs.astype(np.float64)
        return self._tfs64

    def positions_of(self, doc_id: int) -> list:
        if self.positions is None:
            return []
        if self._pos_of is None:
            if isinstance(self.positions,
                          (LazySaltedPositions, LazyEncodedPositions)):
                self.positions = self.positions.materialize()
            self._pos_of = dict(zip(self.doc_ids.tolist(), self.positions))
        return self._pos_of.get(int(doc_id), [])

    def positions_ragged(self):
        """→ (flat_positions int64, lengths int64, starts int64) — the
        ragged positions arrays for vectorized proximity scoring."""
        if self.positions is None:
            return None
        if isinstance(self.positions,
                      (LazySaltedPositions, LazyEncodedPositions)):
            self.positions = self.positions.materialize()
        elif not isinstance(self.positions, RaggedPositions):
            lengths = np.asarray([len(p) for p in self.positions], np.int64)
            flat = (np.concatenate([np.asarray(p, np.int64)
                                    for p in self.positions])
                    if lengths.sum() else np.empty(0, np.int64))
            starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            self.positions = RaggedPositions(flat, lengths, starts)
        p = self.positions
        return p.flat, p.lengths, p.starts

    def positions_slices(self, rows: np.ndarray):
        """→ (flat_sel, len_sel, start_sel) for a SUBSET of posting rows
        — the boost path's accessor; salted terms gather lazily instead
        of merging the whole position payload."""
        if self.positions is None:
            return None
        if isinstance(self.positions,
                      (LazySaltedPositions, LazyEncodedPositions)):
            return self.positions.slices(rows)
        f, ln, st = self.positions_ragged()
        rows = np.asarray(rows, dtype=np.int64)
        len_sel = ln[rows]
        start_sel = np.concatenate(([0], np.cumsum(len_sel)[:-1]))
        total = int(len_sel.sum())
        idx = np.repeat(st[rows] - start_sel, len_sel) + np.arange(total)
        return f[idx], len_sel, start_sel


def _decode_row(row: dict) -> PostingsRec:
    doc_ids, tfs, dls = decode_postings(
        row["docs_enc"], row["tfs_enc"], row["dls_enc"]
    )
    if tfs.size == 0 and doc_ids.size:
        # boolean at-rest format: docs only (tf ≡ 1, dl unused)
        tfs = np.ones(doc_ids.size, np.int64)
        dls = np.zeros(doc_ids.size, np.int64)
    weights = None
    if row["weights"]:
        weights = np.asarray(row["weights"], dtype=np.float64)
    positions = None
    if row["positions_enc"]:
        # tf == per-doc position count for positional postings; keep the
        # payload ENCODED — the pruned boost path decodes only its
        # candidate docs' byte ranges (LazyEncodedPositions)
        positions = LazyEncodedPositions(row["positions_enc"], tfs)
    return PostingsRec(
        term=row["term"], df=int(row["df"]), idf=float(row["idf"]),
        doc_ids=doc_ids, tfs=tfs, dls=dls, weights=weights, positions=positions,
        block_max_tf=row.get("block_max_tf"),
    )


def _merge_salted(recs: list[PostingsRec]) -> PostingsRec:
    """Salted head term: concatenate sub-lists and restore ascending doc
    order. df/idf are global on every record (merge.py hot_df)."""
    if len(recs) == 1:
        return recs[0]
    doc_ids = np.concatenate([r.doc_ids for r in recs])
    order = np.argsort(doc_ids, kind="stable")
    tfs = np.concatenate([r.tfs for r in recs])[order]
    dls = np.concatenate([r.dls for r in recs])[order]
    weights = None
    if recs[0].weights is not None:
        weights = np.concatenate([r.weights for r in recs])[order]
    positions = None
    if recs[0].positions is not None:
        # NO up-front gather OR decode: record each merged row's (salt,
        # within-salt row); position payloads stay encoded per salt and
        # are decoded lazily per subset (the cold positional query only
        # ever touches its pruned candidate docs)
        rag = [r.positions if isinstance(r.positions, LazyEncodedPositions)
               else r.positions_ragged() for r in recs]
        counts = np.asarray([r.doc_ids.size for r in recs], np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))
        src_salt_c = np.repeat(np.arange(len(recs)), counts)
        src_idx_c = np.arange(int(counts.sum())) - offs[src_salt_c]
        positions = LazySaltedPositions(
            salt_rags=rag,
            src_salt=src_salt_c[order],
            src_idx=src_idx_c[order],
            lengths=tfs,
        )
    return PostingsRec(
        term=recs[0].term, df=recs[0].df, idf=recs[0].idf,
        doc_ids=doc_ids[order], tfs=tfs, dls=dls,
        weights=weights, positions=positions,
    )


class ShardReader:
    """Routes terms to shards via the manifest's lexicographic
    boundaries and fetches+decodes posting lists with an LRU cache."""

    def __init__(self, manifest: dict, cache_size: int = 10_000):
        self.boundaries: list[str] = manifest["boundaries"]
        self.files_of_shard: dict[int, list[str]] = {}
        for s in manifest["shards"]:
            self.files_of_shard.setdefault(s["shard"], []).append(s["file"])
        self.cache: OrderedDict[str, PostingsRec | None] = OrderedDict()
        self.cache_size = cache_size

    def shard_of(self, term: str) -> int:
        return bisect.bisect_right(self.boundaries, term)

    def export_cache(self) -> dict:
        """Snapshot of the decoded-postings cache, for broadcasting a
        pre-warmed head-term working set to a serving pool."""
        return dict(self.cache)

    def load_cache(self, warm: dict) -> None:
        """Install a pre-warmed {term: PostingsRec|None} map (e.g. the
        ``ray.get`` of a broadcast ref). Plasma-backed arrays arrive
        read-only, so the hot arrays are copied writable; position
        payloads stay shared (they are decoded into fresh arrays on
        first use)."""
        import copy as _copy

        for t, rec in warm.items():
            if rec is not None:
                rec = _copy.copy(rec)
                rec.doc_ids = np.array(rec.doc_ids)
                rec.tfs = np.array(rec.tfs)
                rec.dls = np.array(rec.dls)
                if rec.weights is not None:
                    rec.weights = np.array(rec.weights)
                rec._tfs64 = rec._dldiv = rec._contrib = None
                rec._pos_of = None
            self.cache[t] = rec
            self.cache.move_to_end(t)

    def fetch(self, terms: list[str]) -> dict[str, PostingsRec | None]:
        out: dict[str, PostingsRec | None] = {}
        missing_by_shard: dict[int, list[str]] = {}
        for t in dict.fromkeys(terms):
            if t in self.cache:
                self.cache.move_to_end(t)
                out[t] = self.cache[t]
            else:
                missing_by_shard.setdefault(self.shard_of(t), []).append(t)

        for shard, ts in missing_by_shard.items():
            found: dict[str, list[PostingsRec]] = {}
            for f in self.files_of_shard.get(shard, []):
                tbl = pq.read_table(f, filters=[("term", "in", ts)])
                for row in tbl.to_pylist():
                    found.setdefault(row["term"], []).append(_decode_row(row))
            for t in ts:
                rec = _merge_salted(found[t]) if t in found else None
                out[t] = rec
                self.cache[t] = rec
                if len(self.cache) > self.cache_size:
                    self.cache.popitem(last=False)
        return out
