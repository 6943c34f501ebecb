"""Index merge: N independently built indexes over DISJOINT doc-id
sets → one index that answers every query exactly as a single build
over the union corpus would (bit-identical scores).

This is the incremental-indexing path the reference lacks entirely
(its SPIMI merge, spimi.py:150-209, only merges the blocks of ONE
build): index new crawl shards on their own cadence, then merge —
no re-tokenization, no corpus re-scan.

Why exact: every per-posting payload is doc-local (tf, dl, positions,
lnc doc weights), so merging only re-splices posting lists; the two
corpus-global quantities are recomputed exactly — idf from the summed
df and the summed doc count, avgdl from the INTEGER totals
(n_docs, total_dl) each manifest already carries. ``ShardWriter``
re-encodes, re-sorts interleaved segments, and rebuilds skip/block-max
structures, so WAND and positional search work unchanged.

Ray-Data shape: one ``read_parquet`` over all source shard files →
``map_batches`` decode to spill-schema rows (term, new gkey, posting
lists) → ``groupby(gkey).map_groups(ShardWriter)``. One keyed shuffle
whose rows are per-(term, source-record) aggregates, never per
posting — the same exchange contract as the build itself. The docmap
(tokenized checkpoints) is hardlinked, not copied, when the
filesystem allows.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.build.merge import MAX_SALTS, ShardWriter, _shard_ids
from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.state.codec import decode_positions, decode_postings

# config fields that must agree for a merge to be meaningful: anything
# that changes tokenization or scoring semantics. Partitioning knobs
# (num_shards, hot_salts) may differ — the merged index re-partitions.
_SEMANTIC_CFG = (
    "ranker", "posting_type", "min_token_length", "use_stop_words",
    "language", "k", "b", "smart_schema",
)


def _doc_range(index_dir: str) -> tuple[int, int]:
    """(min, max) doc id of an index, from tokenized-checkpoint parquet
    footers only (no data read)."""
    lo, hi = None, None
    for f in sorted(glob.glob(os.path.join(index_dir, "tokenized",
                                           "*.parquet"))):
        meta = pq.read_metadata(f)
        idx = meta.schema.names.index("doc_id")
        for i in range(meta.num_row_groups):
            st = meta.row_group(i).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        raise ValueError(f"{index_dir}: no tokenized checkpoints")
    return int(lo), int(hi)


def _fold_sidecars(index_dir: str) -> tuple[int, int]:
    """(min_dl, max_dl) over an index's fragment sidecars — needed only
    to rebuild the positional rankers' dldiv bounds."""
    lo, hi = None, None
    for f in glob.glob(os.path.join(index_dir, "tokenized_stats",
                                    "*.stats.json")):
        with open(f) as fh:
            s = json.load(fh)
        if s["docs"]:
            lo = s["min_dl"] if lo is None else min(lo, s["min_dl"])
            hi = s["max_dl"] if hi is None else max(hi, s["max_dl"])
    if lo is None:
        raise ValueError(f"{index_dir}: no sidecar stats "
                         "(tokenized_stats/*.stats.json)")
    return int(lo), int(hi)


def _link_or_copy(src: str, dst: str) -> None:
    if os.path.exists(dst):
        return
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst + ".tmp")
        os.replace(dst + ".tmp", dst)


class _DecodeToSpill:
    """Shard records (one per term×salt×source) → spill-schema rows
    under the TARGET boundaries, optionally dropping a sorted doc-id
    set (the delete path). Stateless per batch; schema is fixed by the
    config so every block agrees."""

    def __init__(self, boundaries: list[str], has_weights: bool,
                 has_positions: bool,
                 drop_sorted: np.ndarray | None = None):
        self.boundaries = boundaries
        self.has_weights = has_weights
        self.has_positions = has_positions
        self.drop = drop_sorted

    def _keep_mask(self, doc_ids: np.ndarray) -> np.ndarray | None:
        if self.drop is None or not doc_ids.size:
            return None
        pos = np.searchsorted(self.drop, doc_ids)
        valid = pos < self.drop.size
        hit = np.zeros(doc_ids.size, bool)
        hit[valid] = self.drop[pos[valid]] == doc_ids[valid]
        return ~hit

    def __call__(self, b: pa.Table) -> pa.Table:
        n = b.num_rows
        keep_rows = []
        docs_l, tfs_l, dls_l, w_l, p_l, first = [], [], [], [], [], []
        for i in range(n):
            doc_ids, tfs, dls = decode_postings(
                b["docs_enc"][i].as_py(), b["tfs_enc"][i].as_py(),
                b["dls_enc"][i].as_py())
            if tfs.size == 0 and doc_ids.size:
                # boolean at-rest records: docs only (tf≡1, dl unused)
                tfs = np.ones(doc_ids.size, np.int64)
                dls = np.zeros(doc_ids.size, np.int64)
            w = ([float(x) for x in b["weights"][i].as_py()]
                 if self.has_weights else None)
            p = None
            if self.has_positions:
                enc = b["positions_enc"][i].as_py()
                p = (decode_positions(enc, len(doc_ids))
                     if enc else [[]] * len(doc_ids))
            mask = self._keep_mask(doc_ids)
            if mask is not None:
                doc_ids, tfs, dls = doc_ids[mask], tfs[mask], dls[mask]
                if w is not None:
                    w = [x for x, m in zip(w, mask) if m]
                if p is not None:
                    p = [x for x, m in zip(p, mask) if m]
            if not doc_ids.size:
                continue                      # term vanished entirely
            keep_rows.append(i)
            docs_l.append(doc_ids)
            tfs_l.append(tfs.astype(np.int32))
            dls_l.append(dls.astype(np.int32))
            first.append(int(doc_ids[0]))
            if self.has_weights:
                w_l.append(w)
            if self.has_positions:
                p_l.append(p)
        terms = b["term"].take(pa.array(keep_rows, pa.int64()))
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        shard = _shard_ids(terms, self.boundaries)
        cols = {
            "gkey": pa.array(shard * MAX_SALTS, pa.int64()),
            "term": terms,
            "first_doc": pa.array(first, pa.int64()),
            "doc_ids": pa.array(docs_l, pa.list_(pa.int64())),
            "tfs": pa.array(tfs_l, pa.list_(pa.int32())),
            "dls": pa.array(dls_l, pa.list_(pa.int32())),
        }
        if self.has_weights:
            cols["weights"] = pa.array(w_l, pa.list_(pa.float64()))
        if self.has_positions:
            cols["positions"] = pa.array(p_l, pa.list_(pa.list_(pa.int32())))
        return pa.table(cols)


def merge_indexes(index_dirs: list[str], out_dir: str,
                  overwrite: bool = False) -> dict:
    """Merge ``index_dirs`` (disjoint doc-id sets, same semantic
    config) into ``out_dir``; returns the merged manifest dict."""
    import ray.data

    from searchengine_ray.build.pipeline import MANIFEST_NAME, load_manifest

    if len(index_dirs) < 2:
        raise ValueError("need at least two indexes to merge")
    if os.path.exists(os.path.join(out_dir, MANIFEST_NAME)):
        if not overwrite:
            raise ValueError(
                f"{out_dir} already holds an index; pass overwrite=True")
        shutil.rmtree(out_dir)

    t0 = time.perf_counter()
    manifests = [load_manifest(d) for d in index_dirs]
    base = manifests[0]
    for d, m in zip(index_dirs[1:], manifests[1:]):
        if m["tokenizer"] != base["tokenizer"]:
            raise ValueError(f"{d}: tokenizer config differs")
        for k in _SEMANTIC_CFG:
            if m["config"].get(k) != base["config"].get(k):
                raise ValueError(f"{d}: config field {k!r} differs "
                                 f"({m['config'].get(k)!r} vs "
                                 f"{base['config'].get(k)!r})")

    # doc-id disjointness: a shared id would silently corrupt posting
    # lists. Footer-range check is the free fast path; interleaved
    # ranges (e.g. parity splits) fall back to an EXACT distributed
    # duplicate probe over just the 8-byte id column — negligible next
    # to the posting shuffle below.
    ranges = sorted((_doc_range(d), d) for d in index_dirs)
    if any(r2[0] <= r1[1]
           for (r1, _), (r2, _) in zip(ranges, ranges[1:])):
        tok_files = [f for d in index_dirs for f in glob.glob(
            os.path.join(d, "tokenized", "*.parquet"))]
        dup = (
            ray.data.read_parquet(tok_files, columns=["doc_id"])
            .groupby("doc_id").count()
            .map_batches(lambda b: b.filter(pc.greater(b["count()"], 1)),
                         batch_format="pyarrow")
            .take(5)
        )
        if dup:
            raise ValueError(
                "doc ids shared between source indexes (e.g. "
                f"{[r['doc_id'] for r in dup]}) — merged indexes must "
                "cover disjoint documents")

    cfg = IndexConfig.from_manifest(base["config"])
    # exact corpus stats from the integer totals each manifest carries
    n_docs = sum(m["corpus"]["n_docs"] for m in manifests)
    total_dl = sum(m["corpus"]["total_dl"] for m in manifests)
    avgdl = total_dl / n_docs if n_docs else 0.0
    min_dl = min(_fold_sidecars(d)[0] for d in index_dirs)
    max_dl = max(_fold_sidecars(d)[1] for d in index_dirs)
    boundaries = base["boundaries"]

    # -- the one exchange: decode → re-shard → ShardWriter ------------
    shard_files = [s["file"] for m in manifests for s in m["shards"]]
    has_w = cfg.ranker in (RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED)
    has_p = cfg.posting_type == PostingType.POSITIONAL
    shard_dir = os.path.join(out_dir, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    writer = ShardWriter(shard_dir, cfg, n_docs, hot_df={})

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    shard_stats = (
        ray.data.read_parquet(shard_files)
        .map_batches(_DecodeToSpill(boundaries, has_w, has_p),
                     batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )

    # -- docmap: hardlink every source's tokenized checkpoints --------
    tok_dir = os.path.join(out_dir, "tokenized")
    stats_dir = os.path.join(out_dir, "tokenized_stats")
    os.makedirs(tok_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)
    for i, d in enumerate(index_dirs):
        for f in glob.glob(os.path.join(d, "tokenized", "*.parquet")):
            _link_or_copy(f, os.path.join(
                tok_dir, f"m{i:03d}-{os.path.basename(f)}"))
        for f in glob.glob(os.path.join(d, "tokenized_stats",
                                        "*.stats.json")):
            _link_or_copy(f, os.path.join(
                stats_dir, f"m{i:03d}-{os.path.basename(f)}"))

    manifest = {
        "version": 1,
        "config": base["config"],
        "tokenizer": base["tokenizer"],
        "corpus": {
            "n_docs": n_docs,
            "total_dl": total_dl,
            "avgdl": avgdl,
            "min_dldiv": round(min_dl / avgdl, 3) if avgdl else 0.0,
            "max_dldiv": round(max_dl / avgdl, 3) if avgdl else 0.0,
            "n_input_rows": sum(m["corpus"].get("n_input_rows", 0)
                                for m in manifests),
        },
        "lineage": {
            "merged_from": list(index_dirs),
            "stage_version": 1,
        },
        "boundaries": boundaries,
        "hot_df": {},
        "hot_salt_of": {},
        "shards": [
            {"shard": int(r["shard"]), "salt": int(r["salt"]),
             "file": r["file"], "n_terms": int(r["n_terms"]),
             "n_postings": int(r["n_postings"])}
            for r in sorted(shard_stats,
                            key=lambda r: (r["shard"], r["salt"]))
        ],
        "metrics": {
            "merge_indexes_sec": round(time.perf_counter() - t0, 3),
            "source_indexes": len(index_dirs),
        },
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def delete_docs(index_dir: str, out_dir: str, doc_ids,
                overwrite: bool = False) -> dict:
    """Remove ``doc_ids`` from an index → a new index at ``out_dir``
    that answers every query exactly as a fresh build over the
    remaining corpus would (bit-identical scores): postings are
    filtered, vanished terms dropped, idf recomputed from the new df
    and doc count, avgdl/dldiv bounds re-folded from the surviving
    docs, and the docmap (tokenized checkpoints) rewritten without the
    deleted rows. With ``merge_indexes`` this completes the index
    lifecycle: add = build shard + merge, remove = delete_docs — no
    re-tokenization either way.

    ``doc_ids`` is an explicit id set broadcast to every task, so it
    must be driver-bounded (the GDPR-takedown / retraction shape —
    thousands to millions of ids, not a corpus-scale predicate; for
    predicate-scale removal, re-curate and rebuild instead)."""
    import ray.data

    from searchengine_ray.build.pipeline import MANIFEST_NAME, load_manifest

    if os.path.exists(os.path.join(out_dir, MANIFEST_NAME)):
        if not overwrite:
            raise ValueError(
                f"{out_dir} already holds an index; pass overwrite=True")
        shutil.rmtree(out_dir)
    t0 = time.perf_counter()
    manifest_in = load_manifest(index_dir)
    cfg = IndexConfig.from_manifest(manifest_in["config"])
    boundaries = manifest_in["boundaries"]
    drop = np.unique(np.asarray(list(doc_ids), dtype=np.int64))

    # -- pass 1: docmap rewrite + exact surviving-corpus stats --------
    tok_dir = os.path.join(out_dir, "tokenized")
    stats_dir = os.path.join(out_dir, "tokenized_stats")
    os.makedirs(tok_dir, exist_ok=True)
    os.makedirs(stats_dir, exist_ok=True)
    src_files = sorted(glob.glob(os.path.join(index_dir, "tokenized",
                                              "*.parquet")))
    if not src_files:
        raise ValueError(f"{index_dir}: no tokenized checkpoints")

    def rewrite(b: pa.Table) -> pa.Table:
        outs = []
        for src in b["src"].to_pylist():
            t = pq.read_table(src)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(drop, ids)
            valid = pos < drop.size
            hit = np.zeros(ids.size, bool)
            hit[valid] = drop[pos[valid]] == ids[valid]
            kept = t.filter(pa.array(~hit))
            dst = os.path.join(tok_dir, os.path.basename(src))
            dls = kept["dl"].to_numpy(zero_copy_only=False) \
                if kept.num_rows else np.empty(0, np.int64)
            stats = {
                "docs": int(kept.num_rows),
                "postings": int(pc.sum(
                    pc.list_value_length(kept["terms"])).as_py() or 0),
                "sum_dl": int(dls.sum()),
                "min_dl": int(dls.min()) if dls.size else 0,
                "max_dl": int(dls.max()) if dls.size else 0,
            }
            if kept.num_rows:
                tmp = dst + f".tmp{os.getpid()}"
                pq.write_table(kept, tmp)
                os.replace(tmp, dst)
                sp = os.path.join(
                    stats_dir,
                    os.path.basename(src).removesuffix(".parquet")
                    + ".stats.json")
                with open(sp + ".tmp", "w") as fh:
                    json.dump(stats, fh)
                os.replace(sp + ".tmp", sp)
            outs.append(stats)
        return pa.table({
            "docs": pa.array([o["docs"] for o in outs], pa.int64()),
            "sum_dl": pa.array([o["sum_dl"] for o in outs], pa.int64()),
            "min_dl": pa.array([o["min_dl"] for o in outs], pa.int64()),
            "max_dl": pa.array([o["max_dl"] for o in outs], pa.int64()),
        })

    parts = (
        ray.data.from_arrow(pa.table({"src": pa.array(src_files)}))
        .repartition(len(src_files))
        .map_batches(rewrite, batch_format="pyarrow", batch_size=None,
                     num_cpus=1)
        .take_all()
    )
    n_docs = sum(p["docs"] for p in parts)
    total_dl = sum(p["sum_dl"] for p in parts)
    avgdl = total_dl / n_docs if n_docs else 0.0
    nonempty = [p for p in parts if p["docs"]]
    min_dl = min((p["min_dl"] for p in nonempty), default=0)
    max_dl = max((p["max_dl"] for p in nonempty), default=0)

    # -- pass 2: posting filter + re-shard -----------------------------
    shard_files = [s["file"] for s in manifest_in["shards"]]
    has_w = cfg.ranker in (RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED)
    has_p = cfg.posting_type == PostingType.POSITIONAL
    shard_dir = os.path.join(out_dir, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    writer = ShardWriter(shard_dir, cfg, n_docs, hot_df={})

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    shard_stats = (
        ray.data.read_parquet(shard_files)
        .map_batches(_DecodeToSpill(boundaries, has_w, has_p,
                                    drop_sorted=drop),
                     batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )

    manifest = {
        "version": 1,
        "config": manifest_in["config"],
        "tokenizer": manifest_in["tokenizer"],
        "corpus": {
            "n_docs": n_docs,
            "total_dl": total_dl,
            "avgdl": avgdl,
            "min_dldiv": round(min_dl / avgdl, 3) if avgdl else 0.0,
            "max_dldiv": round(max_dl / avgdl, 3) if avgdl else 0.0,
            "n_input_rows": n_docs,
        },
        "lineage": {
            "deleted_from": index_dir,
            "n_requested_deletes": int(drop.size),
            "stage_version": 1,
        },
        "boundaries": boundaries,
        "hot_df": {},
        "hot_salt_of": {},
        "shards": [
            {"shard": int(r["shard"]), "salt": int(r["salt"]),
             "file": r["file"], "n_terms": int(r["n_terms"]),
             "n_postings": int(r["n_postings"])}
            for r in sorted(shard_stats,
                            key=lambda r: (r["shard"], r["salt"]))
        ],
        "metrics": {
            "delete_docs_sec": round(time.perf_counter() - t0, 3),
        },
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest
