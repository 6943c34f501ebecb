"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one float64 matmul against it; each
batch emits only its local top-k per query, the driver folds the tiny
partials (no full materialization).

Scale path: LSH-bucketed variant — random-hyperplane signatures (fixed
constants) bucket vectors, candidates are scored only within matching
buckets; multiple tables raise recall. Partitioning assumption: bucket
key distributes uniformly for random hyperplanes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_rs = np.random.RandomState(1234)  # fixed constants, not per-run randomness
_N_PLANES = 12
_N_TABLES = 4


def autoscale_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Actor-pool size range (1, #CPUs) — lets Ray grow the pool to the
    node instead of starving a 32-CPU box with a hardcoded constant,
    while small inputs stay at one actor (no spawn storm)."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if cap is not None:
        n = min(n, cap)
    return (1, max(1, n))


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopKStage:
    """Actor-pool stage: per-batch cosine top-k against the broadcast
    query matrix (queries resolved once per actor in ``__init__``)."""

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.query_ids = np.asarray(q["query_ids"], dtype=np.int64)
        self.qm = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(batch))
        sims = self.qm @ m.T  # (Q, B)
        qids, vids, svals = [], [], []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            mask = vec_ids != self.query_ids[qi]  # exclude self-match
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            sub = row[idx]
            top = idx[np.lexsort((vec_ids[idx], -sub))[:k]]
            qids.extend([int(self.query_ids[qi])] * len(top))
            vids.extend(vec_ids[top].tolist())
            svals.extend(row[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "vec_id": pa.array(vids, pa.int64()),
                "sim": pa.array(svals, pa.float64()),
            }
        )


def cosine_topk(embeddings_ds, query_ids: list[int], k: int = 5):
    """Brute-force exact cosine top-k for ``query_ids`` → small pyarrow
    Table (query_id, vec_id, sim, rank). Exactly one pass over the data;
    driver folds per-batch partials."""
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(query_ids), pa.int64())
    q_rows = embeddings_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], value_set=qset)),
        batch_format="pyarrow",
    ).take_all()  # only the handful of query rows reach the driver
    q_rows.sort(key=lambda r: r["vec_id"])
    qm = np.asarray([r["embedding"] for r in q_rows], dtype=np.float64)
    qids = np.asarray([r["vec_id"] for r in q_rows], dtype=np.int64)
    ref = ray.put({"query_ids": qids, "matrix": qm})

    partials = embeddings_ds.map_batches(
        CosineTopKStage,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=autoscale_concurrency(),
    ).take_all()

    # fold tiny partials per query
    best: dict[int, list[tuple[float, int]]] = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append((r["sim"], r["vec_id"]))
    qout, vout, sout, rout = [], [], [], []
    for qid in sorted(best):
        cand = sorted(best[qid], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, vid) in enumerate(cand, 1):
            qout.append(qid)
            vout.append(vid)
            sout.append(sim)
            rout.append(rank)
    return pa.table(
        {
            "query_id": pa.array(qout, pa.int64()),
            "vec_id": pa.array(vout, pa.int64()),
            "sim": pa.array(sout, pa.float64()),
            "rank": pa.array(rout, pa.int32()),
        }
    )


# -- IVF variant (scale path #2) ------------------------------------------

def _kmeans_deterministic(sample: np.ndarray, k: int, iters: int = 8):
    """Seed-free Lloyd's: init = evenly-strided sample rows; ties break
    to the lowest centroid index. Deterministic for a fixed input."""
    k = min(k, len(sample))
    centroids = sample[:: max(1, len(sample) // k)][:k].copy()
    for _ in range(iters):
        d = sample @ centroids.T  # cosine on normalized vectors
        assign = d.argmax(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IvfTopKStage:
    """Per-batch IVF probe: score only rows whose bucket is probed by
    ≥1 query (bucket = nearest centroid). Broadcast state resolved once
    per actor."""

    def __init__(self, state_ref, k: int = 5):
        import ray

        st = ray.get(state_ref) if not isinstance(state_ref, dict) else state_ref
        self.qm = st["qm"]
        self.query_ids = st["query_ids"]
        self.centroids = st["centroids"]
        self.probe = st["probe"]  # (Q, nprobe) centroid ids per query
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_embedding_matrix(batch))
        buckets = (m @ self.centroids.T).argmax(axis=1)
        qids, vids, svals = [], [], []
        for qi in range(self.qm.shape[0]):
            probed = np.isin(buckets, self.probe[qi]) & (
                vec_ids != self.query_ids[qi]
            )
            idx = np.flatnonzero(probed)
            if idx.size == 0:
                continue
            sims = m[idx] @ self.qm[qi]
            sel = np.lexsort((vec_ids[idx], -sims))[: self.k]
            top = idx[sel]
            qids.extend([int(self.query_ids[qi])] * len(top))
            vids.extend(vec_ids[top].tolist())
            svals.extend(sims[sel].tolist())
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "vec_id": pa.array(vids, pa.int64()),
            "sim": pa.array(svals, pa.float64()),
        })


def ivf_topk(embeddings_ds, query_ids: list[int], k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             sample_cap: int = 2048):
    """Approximate cosine top-k via IVF (inverted-file) probing:
    deterministic k-means centroids from a strided sample, each batch
    scores only vectors in the query's ``nprobe`` nearest cells.
    → pyarrow Table (query_id, vec_id, sim, rank)."""
    import pyarrow.compute as pcc
    import ray

    # deterministic sample: select by id stride (independent of block
    # arrival order, stable across runs and cluster sizes)
    qset = pa.array(sorted(query_ids), pa.int64())
    n_total = embeddings_ds.count()
    stride = max(1, n_total // sample_cap)

    def take_sample(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.flatnonzero(ids % stride == 0),
                                   pa.int64()))

    sample_rows = embeddings_ds.map_batches(
        take_sample, batch_format="pyarrow"
    ).take_all()
    sample_rows.sort(key=lambda r: r["vec_id"])
    sample_rows = sample_rows[:sample_cap]
    sm = _normalize(np.asarray([r["embedding"] for r in sample_rows],
                               dtype=np.float64))
    centroids = _kmeans_deterministic(sm, n_centroids)

    q_rows = embeddings_ds.map_batches(
        lambda b: b.filter(pcc.is_in(b["vec_id"], value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    q_rows.sort(key=lambda r: r["vec_id"])
    qm = _normalize(np.asarray([r["embedding"] for r in q_rows], np.float64))
    qids = np.asarray([r["vec_id"] for r in q_rows], np.int64)
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]

    ref = ray.put({"qm": qm, "query_ids": qids, "centroids": centroids,
                   "probe": probe})
    partials = embeddings_ds.map_batches(
        IvfTopKStage,
        fn_constructor_kwargs=dict(state_ref=ref, k=k),
        batch_format="pyarrow", batch_size=4096,
        concurrency=autoscale_concurrency(),
    ).take_all()

    best: dict[int, list[tuple[float, int]]] = {}
    for r in partials:
        best.setdefault(r["query_id"], []).append((r["sim"], r["vec_id"]))
    qout, vout, sout, rout = [], [], [], []
    for qid in sorted(best):
        cand = sorted(best[qid], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, vid) in enumerate(cand, 1):
            qout.append(qid)
            vout.append(vid)
            sout.append(sim)
            rout.append(rank)
    return pa.table({
        "query_id": pa.array(qout, pa.int64()),
        "vec_id": pa.array(vout, pa.int64()),
        "sim": pa.array(sout, pa.float64()),
        "rank": pa.array(rout, pa.int32()),
    })


# -- LSH-bucketed variant (scale path) ------------------------------------

_PLANES: np.ndarray | None = None


def _planes(dim: int) -> np.ndarray:
    global _PLANES
    if _PLANES is None or _PLANES.shape[2] != dim:
        _PLANES = _rs.randn(_N_TABLES, _N_PLANES, dim)
    return _PLANES


def lsh_bucket_batch(batch: pa.Table) -> pa.Table:
    """(table_id, bucket, vec_id, all_buckets) — random-hyperplane
    signature rows; ``all_buckets`` (every table's bucket for the vec)
    lets the pair stage emit each pair from its first colliding table
    only (globally distinct pairs, no dedup shuffle)."""
    m = _normalize(_embedding_matrix(batch))
    vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    planes = _planes(m.shape[1])
    n = m.shape[0]
    buckets = np.empty((_N_TABLES, n), dtype=np.int64)
    for t in range(_N_TABLES):
        signs = (m @ planes[t].T) > 0  # (B, P)
        bucket = np.zeros(n, dtype=np.int64)
        for p in range(_N_PLANES):
            bucket |= signs[:, p].astype(np.int64) << p
        buckets[t] = bucket
    all_flat = np.repeat(buckets.T.reshape(1, -1), _N_TABLES,
                         axis=0).reshape(-1)
    return pa.table(
        {
            "table_id": pa.array(
                np.repeat(np.arange(_N_TABLES, dtype=np.int32), n), pa.int32()
            ),
            "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            "vec_id": pa.array(np.tile(vec_ids, _N_TABLES), pa.int64()),
            "all_buckets": pa.FixedSizeListArray.from_arrays(
                pa.array(all_flat, pa.int64()), _N_TABLES
            ),
        }
    )


def lsh_candidate_pairs(embeddings_ds, max_bucket: int = 500):
    """Near-neighbor candidate pairs via hyperplane-LSH bucketing —
    ONE groupby shuffle on (table, bucket); distinct by the
    first-colliding-table rule inside each group."""
    from searchengine_ray.pipelines.dedup import bucket_pairs_group

    rows = embeddings_ds.map_batches(lsh_bucket_batch, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        renamed = group.rename_columns(
            ["band", "bucket", "doc_id", "all_buckets"]
        )
        return bucket_pairs_group(renamed, max_bucket=max_bucket)

    return rows.groupby(["table_id", "bucket"]).map_groups(
        pairs, batch_format="pyarrow"
    )
