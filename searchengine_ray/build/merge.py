"""The term shuffle: tokenized docs → postings → lexicographic term
shards with compressed posting lists.

Replaces the reference's k-way heap merge over sorted block files
(``spimi.py:150-209``) with ONE all-to-all exchange:

1. ``explode_batch`` — vectorized flatten of the doc-major tokenized
   table into postings rows ``(term, doc_id, tf, dl, positions,
   tf_weight)`` plus a group key (Arrow compute, no per-row Python).
2. shard key = lexicographic range of ``term`` (boundaries sampled from
   the corpus — north_star: "sharded lexicographically by term"); head
   terms whose sampled frequency exceeds a threshold are SALTED across
   ``hot_salts`` sub-groups by ``doc_id % hot_salts`` so no single
   group holds a whole stopword-scale posting list (skew — SURVEY §4).
3. ``groupby(gkey).map_groups(ShardWriter)`` — per group: sort by
   (term, doc_id), run-length split by term, delta-gap + varbyte encode
   (state/codec.py), idf = round(ln(N/df),3) (reference
   ``bm25.py:105-106``), write one shard parquet atomically.

Salted terms' df/idf cannot be computed inside a single group; their
exact global df is pre-computed (they are few) and broadcast in
``hot_df`` (reference semantics kept: idf from TOTAL df).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.functions.smart import bm25_idf, calculate_idf
from searchengine_ray.state.codec import (
    BLOCK,
    encode_positions,
    encode_postings,
)

MAX_SALTS = 64  # gkey = shard * MAX_SALTS + salt


def explode_batch(tok: pa.Table) -> pa.Table:
    """Doc-major tokenized rows → flat postings rows (all-Arrow/numpy)."""
    counts = pc.list_value_length(tok["terms"])
    terms = pc.list_flatten(tok["terms"])
    n = np.asarray(counts.to_numpy(zero_copy_only=False), dtype=np.int64)
    doc_ids = np.repeat(tok["doc_id"].to_numpy(zero_copy_only=False), n)
    dls = np.repeat(tok["dl"].to_numpy(zero_copy_only=False), n)
    tfs = pc.list_flatten(tok["tfs"])
    cols = {
        "term": terms,
        "doc_id": pa.array(doc_ids, pa.int64()),
        "tf": tfs,
        "dl": pa.array(dls, pa.int32()),
    }
    if "tf_weights" in tok.column_names:
        weights = pc.list_flatten(tok["tf_weights"])
        if len(weights) == len(terms):
            cols["tf_weight"] = weights
    if "positions" in tok.column_names:
        positions = pc.list_flatten(tok["positions"])  # aligned when positional
        if len(positions) == len(terms):
            cols["positions"] = positions
    return pa.table(cols)


def assign_gkey(
    postings: pa.Table,
    boundaries: list[str],
    hot_salt_of: dict[str, int],
) -> pa.Table:
    """Add the shuffle key: shard from lexicographic boundaries (k
    vectorized compares, k = num_shards-1), salt for hot terms."""
    terms = postings["term"]
    shard = np.zeros(len(terms), dtype=np.int64)
    for b in boundaries:
        shard += pc.greater_equal(terms, pa.scalar(b)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    salt = np.zeros(len(terms), dtype=np.int64)
    if hot_salt_of:
        hot_list = list(hot_salt_of.keys())
        mask = pc.is_in(terms, value_set=pa.array(hot_list)).to_numpy(
            zero_copy_only=False
        )
        if mask.any():
            doc_ids = postings["doc_id"].to_numpy(zero_copy_only=False)
            nsalt = np.ones(len(terms), dtype=np.int64)
            # per-term salt counts (hot set is small → one pass per hot term)
            for t, s in hot_salt_of.items():
                tmask = pc.equal(terms, pa.scalar(t)).to_numpy(zero_copy_only=False)
                nsalt[tmask] = max(1, min(s, MAX_SALTS))
            salt[mask] = doc_ids[mask] % nsalt[mask]
    gkey = shard * MAX_SALTS + salt
    return postings.append_column("gkey", pa.array(gkey, pa.int64()))


def sample_term_boundaries(
    tok_ds,
    num_shards: int,
    sample_cap: int = 200_000,
    hot_frac: float = 0.01,
    hot_salts: int = 8,
):
    """Deterministic term sample → (boundaries, hot_salt_of).

    Every k-th flattened term per batch (k sized from the dataset's
    postings count estimate) — seed-free and stable for a fixed input.
    Hot terms = terms exceeding ``hot_frac`` of the sample (collection-
    frequency skew proxy).
    """

    def sampler(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch["terms"])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string())})
        step = max(1, len(flat) // 2000)
        return pa.table({"term": flat.combine_chunks()[::step]})

    sampled = tok_ds.map_batches(sampler, batch_format="pyarrow").take_all()
    terms = sorted(r["term"] for r in sampled)
    if not terms:
        return [], {}
    arr = np.asarray(terms, dtype=object)
    if len(arr) > sample_cap:
        arr = arr[:: len(arr) // sample_cap]
    boundaries = []
    for i in range(1, num_shards):
        b = arr[min(len(arr) - 1, i * len(arr) // num_shards)]
        if not boundaries or b != boundaries[-1]:
            boundaries.append(str(b))
    # hot-term detection on the sample
    uniq, counts = np.unique(arr, return_counts=True)
    hot = {}
    if hot_salts > 1:
        thresh = max(2, int(hot_frac * len(arr)))
        for t, c in zip(uniq[counts >= thresh], counts[counts >= thresh]):
            hot[str(t)] = hot_salts
    return boundaries, hot


def exact_hot_df(tok_ds, hot_terms: list[str]) -> dict[str, int]:
    """Exact global df for the (few) salted terms: per-batch partial
    counts (combiner) → tiny groupby-sum on the driver."""
    if not hot_terms:
        return {}
    hot_arr = pa.array(hot_terms)

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch["terms"])  # distinct within doc already
        sel = flat.filter(pc.is_in(flat, value_set=hot_arr))
        vc = pc.value_counts(sel)
        if len(vc) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64())}
            )
        return pa.table({"term": vc.field("values"), "df": vc.field("counts")})

    rows = tok_ds.map_batches(partial, batch_format="pyarrow").take_all()
    out: dict[str, int] = {}
    for r in rows:
        out[r["term"]] = out.get(r["term"], 0) + int(r["df"])
    return out


class ShardWriter:
    """``map_groups`` function for one gkey group → one shard parquet.

    Plain callable (not an actor): each group is independent; the write
    is atomic (tmp + rename) and skipped if the file already exists, so
    a re-run after a crash only redoes missing shards.
    """

    def __init__(
        self,
        out_dir: str,
        cfg: IndexConfig,
        n_docs: int,
        hot_df: dict[str, int] | None = None,
    ):
        self.out_dir = out_dir
        self.cfg = cfg
        self.n_docs = n_docs
        self.hot_df = hot_df or {}

    def _idf(self, df: int) -> float:
        cfg = self.cfg
        if cfg.ranker in (RankerType.TF_IDF, RankerType.TF_IDF_OPTIMIZED):
            return float(calculate_idf(self.n_docs, df, cfg.smart_schema[5]))
        return bm25_idf(self.n_docs, df)

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self._stats_table([])
        gkey = int(group["gkey"][0].as_py())
        shard_id, salt = divmod(gkey, MAX_SALTS)
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"shard-{shard_id:05d}-{salt:02d}.parquet")
        if os.path.exists(path):
            meta = pq.read_metadata(path)
            return self._stats_table(
                [(shard_id, salt, path, meta.num_rows, -1, True)]
            )

        tbl = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        tfs = tbl["tf"].to_numpy(zero_copy_only=False)
        dls = tbl["dl"].to_numpy(zero_copy_only=False)
        has_w = "tf_weight" in tbl.column_names
        has_p = "positions" in tbl.column_names
        weights = tbl["tf_weight"].to_numpy(zero_copy_only=False) if has_w else None
        pos_lists = tbl["positions"].to_pylist() if has_p else None

        uniq, starts = np.unique(terms, return_index=True)
        ends = np.append(starts[1:], len(terms))

        rec = {k: [] for k in (
            "term", "salt", "df", "idf", "n", "docs_enc", "tfs_enc",
            "dls_enc", "weights", "positions_enc", "skip_docs", "block_max_tf",
        )}
        n_postings = 0
        for t, s, e in zip(uniq, starts, ends):
            d = doc_ids[s:e]
            f = tfs[s:e]
            docs_enc, tfs_enc, dls_enc, skip_docs, block_max = encode_postings(
                d, f, dls[s:e]
            )
            df_total = self.hot_df.get(t, e - s) if salt or t in self.hot_df else e - s
            rec["term"].append(str(t))
            rec["salt"].append(salt)
            rec["df"].append(int(df_total))
            rec["idf"].append(self._idf(int(df_total)))
            rec["n"].append(int(e - s))
            rec["docs_enc"].append(docs_enc)
            rec["tfs_enc"].append(tfs_enc)
            rec["dls_enc"].append(dls_enc)
            rec["weights"].append(
                [round(float(w), 3) for w in weights[s:e]] if has_w else []
            )
            rec["positions_enc"].append(
                encode_positions(pos_lists[s:e]) if has_p else b""
            )
            rec["skip_docs"].append(skip_docs)
            rec["block_max_tf"].append(block_max)
            n_postings += int(e - s)

        out = pa.table(
            {
                "term": pa.array(rec["term"], pa.string()),
                "salt": pa.array(rec["salt"], pa.int32()),
                "df": pa.array(rec["df"], pa.int64()),
                "idf": pa.array(rec["idf"], pa.float64()),
                "n": pa.array(rec["n"], pa.int64()),
                "docs_enc": pa.array(rec["docs_enc"], pa.binary()),
                "tfs_enc": pa.array(rec["tfs_enc"], pa.binary()),
                "dls_enc": pa.array(rec["dls_enc"], pa.binary()),
                "weights": pa.array(rec["weights"], pa.list_(pa.float64())),
                "positions_enc": pa.array(rec["positions_enc"], pa.binary()),
                "skip_docs": pa.array(rec["skip_docs"], pa.list_(pa.int64())),
                "block_max_tf": pa.array(rec["block_max_tf"], pa.list_(pa.int32())),
            }
        )
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(out, tmp, row_group_size=2048)
        os.replace(tmp, path)
        return self._stats_table(
            [(shard_id, salt, path, out.num_rows, n_postings, False)]
        )

    @staticmethod
    def _stats_table(rows):
        return pa.table(
            {
                "shard": pa.array([r[0] for r in rows], pa.int64()),
                "salt": pa.array([r[1] for r in rows], pa.int64()),
                "file": pa.array([r[2] for r in rows], pa.string()),
                "n_terms": pa.array([r[3] for r in rows], pa.int64()),
                "n_postings": pa.array([r[4] for r in rows], pa.int64()),
                "skipped": pa.array([r[5] for r in rows], pa.bool_()),
            }
        )
