"""Connected-component dup clusters + IVF approximate ANN."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_dup_clusters(ray_session):
    import ray.data

    from searchengine_ray.pipelines.clusters import dup_clusters

    # components: {1,2,3,9} (chain), {5,6}, {7,8}
    pairs = pa.table({
        "doc_a": pa.array([1, 2, 5, 7, 3], pa.int64()),
        "doc_b": pa.array([2, 3, 6, 8, 9], pa.int64()),
    })
    out = dup_clusters(ray.data.from_arrow(pairs)).take_all()
    got = {r["doc_id"]: r["cluster"] for r in out}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 7, 8: 7}


def test_dup_clusters_long_chain(ray_session):
    import ray.data

    from searchengine_ray.pipelines.clusters import dup_clusters

    n = 12  # path graph 0-1-2-...-11: needs several propagation rounds
    pairs = pa.table({
        "doc_a": pa.array(list(range(n - 1)), pa.int64()),
        "doc_b": pa.array(list(range(1, n)), pa.int64()),
    })
    out = dup_clusters(ray.data.from_arrow(pairs), max_rounds=16).take_all()
    assert {r["cluster"] for r in out} == {0}
    assert len(out) == n


def test_ivf_recall_vs_bruteforce(ray_session):
    import ray.data

    from searchengine_ray.pipelines.similarity import cosine_topk, ivf_topk

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(emb)
    exact = cosine_topk(ds, query_ids=[0, 1, 2], k=5)
    approx = ivf_topk(ds, query_ids=[0, 1, 2], k=5, n_centroids=8, nprobe=4)

    def tops(t):
        d = {}
        for r in t.to_pylist():
            d.setdefault(r["query_id"], set()).add(r["vec_id"])
        return d

    te, ta = tops(exact), tops(approx)
    recalls = [len(te[q] & ta.get(q, set())) / len(te[q]) for q in te]
    assert np.mean(recalls) >= 0.5, recalls  # nprobe=4 of 8 cells
    # sims reported by IVF are exact cosine values for probed vectors
    ex = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact.to_pylist()}
    for r in approx.to_pylist():
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            assert abs(ex[key] - r["sim"]) < 1e-12


def test_ivf_persisted_probe_reads_only_probed_cells(ray_session, tmp_path):
    """The persisted IVF layout must prune I/O to the probed cell
    directories (round-2: no full scan per probe)."""
    import ray.data

    from searchengine_ray.pipelines.similarity import ivf_build, ivf_search

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.from_arrow(emb)
    idx = str(tmp_path / "ivf")
    man = ivf_build(ds, idx, n_centroids=8)
    assert man["n_centroids"] == 8

    qm = np.asarray(emb["embedding"].to_pylist()[:2], dtype=np.float64)
    qids = np.asarray(emb["vec_id"].to_pylist()[:2], dtype=np.int64)
    out, stats = ivf_search(idx, qm, qids, k=5, nprobe=2,
                            return_stats=True)
    assert out.num_rows > 0
    assert stats["cells_probed"] <= 4  # <= 2 queries x 2 cells
    assert stats["files_read"] < stats["files_total"]
    # rebuild is a no-op (manifest cache)
    assert ivf_build(ds, idx, n_centroids=8) == man


def test_dup_clusters_larger_graph(ray_session):
    """5k-edge multi-component graph: min-label propagation converges
    and labels every component by its min id (join path exercised well
    past the toy sizes)."""
    import ray.data

    n_comp, comp_size = 100, 50  # 100 disjoint 50-node chains
    a, b = [], []
    for c in range(n_comp):
        base = c * 1000
        a.extend(range(base, base + comp_size - 1))
        b.extend(range(base + 1, base + comp_size))
    pairs = pa.table({"doc_a": pa.array(a, pa.int64()),
                      "doc_b": pa.array(b, pa.int64())})
    from searchengine_ray.pipelines.clusters import dup_clusters

    out = dup_clusters(ray.data.from_arrow(pairs), max_rounds=16).take_all()
    assert len(out) == n_comp * comp_size
    for r in out:
        assert r["cluster"] == (r["doc_id"] // 1000) * 1000


def test_embedding_clusters_assignment_exact(ray_session):
    import ray

    from searchengine_ray.pipelines.similarity import (
        _embedding_matrix,
        _normalize,
        _train_centroids,
        embedding_clusters,
    )

    rng = np.random.default_rng(17)
    n, dim, k = 400, 16, 6
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in emb],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = embedding_clusters(ds, n_centroids=k).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # partitioning independence
    got2 = embedding_clusters(ds.repartition(2), n_centroids=k) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert got.equals(got2)
    assert set(got["cell"]) <= set(range(k)) and got["cell"].nunique() > 1
    # every vector sits in its argmax cell under the trained centroids
    cents = _train_centroids(ds, k, 2048, n)
    m = _normalize(_embedding_matrix(tbl))
    want = (m @ cents.T).argmax(axis=1)
    assert (got["cell"].to_numpy() == want).all()
