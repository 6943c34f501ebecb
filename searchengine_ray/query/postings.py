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

from searchengine_ray.state.codec import decode_positions, decode_postings


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
            self._pos_of = dict(zip(self.doc_ids.tolist(), self.positions))
        return self._pos_of.get(int(doc_id), [])


def _decode_row(row: dict) -> PostingsRec:
    doc_ids, tfs, dls = decode_postings(
        row["docs_enc"], row["tfs_enc"], row["dls_enc"]
    )
    weights = None
    if row["weights"]:
        weights = np.asarray(row["weights"], dtype=np.float64)
    positions = None
    if row["positions_enc"]:
        positions = decode_positions(row["positions_enc"], len(doc_ids))
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
        flat = [p for r in recs for p in r.positions]
        positions = [flat[i] for i in order]
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
