"""Index merge must be EXACT: searches over a merged index return
bit-identical (doc_id, score) to a single build over the union corpus
— for BM25, TF-IDF (doc weights) and positional (proximity boost)
configs — and the guards (overlap, config mismatch) must fire."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.merge_indexes import merge_indexes
from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.query.engine import Searcher

QUERIES = ["alpha beta", "gamma rare7", "mid3 mid4 alpha", "missing zz"]


def _corpus(n=300, seed=5):
    rng = random.Random(seed)
    vocab = (["alpha", "beta", "gamma"] + [f"mid{i}" for i in range(10)]
             + [f"rare{i}" for i in range(30)])
    texts = [" ".join(rng.choices(vocab, k=rng.randint(4, 30)))
             for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(n)]),
        "text": pa.array(texts, pa.large_string()),
    })


def _build_halves_and_union(tmp, corpus, cfg):
    """Interleaved (parity) split — the adversarial case where doc-id
    RANGES overlap but sets are disjoint."""
    import pyarrow.compute as pc

    paths = {}
    for name, tbl in (
        ("even", corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"],
                                                        1), 0))),
        ("odd", corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"],
                                                       1), 1))),
        ("all", corpus),
    ):
        p = str(tmp / f"{name}.parquet")
        pq.write_table(tbl, p)
        idx = str(tmp / f"idx_{name}")
        build_index(p, idx, cfg, id_column="doc_id",
                    text_column="text", url_column="url")
        paths[name] = idx
    merged = str(tmp / "merged")
    merge_indexes([paths["even"], paths["odd"]], merged)
    return merged, paths["all"]


def _assert_same_searches(merged, union, positional=False):
    sm, su = Searcher(merged), Searcher(union)
    for q in QUERIES:
        tm = sm.search(q, 20, with_urls=True)
        tu = su.search(q, 20, with_urls=True)
        assert tm["doc_id"].to_pylist() == tu["doc_id"].to_pylist(), q
        assert tm["score"].to_pylist() == tu["score"].to_pylist(), q
        assert tm["url"].to_pylist() == tu["url"].to_pylist(), q


@pytest.mark.usefixtures("ray_session")
def test_bm25_merge_bit_identical(tmp_path):
    cfg = IndexConfig(num_shards=3, min_token_length=2,
                      use_stop_words=False, language=None)
    merged, union = _build_halves_and_union(tmp_path, _corpus(), cfg)
    _assert_same_searches(merged, union)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_merge_bit_identical(tmp_path):
    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None,
                      ranker=RankerType.TF_IDF)
    merged, union = _build_halves_and_union(tmp_path, _corpus(seed=7), cfg)
    _assert_same_searches(merged, union)


@pytest.mark.usefixtures("ray_session")
def test_positional_merge_bit_identical(tmp_path):
    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None,
                      ranker=RankerType.BM25_OPTIMIZED,
                      posting_type=PostingType.POSITIONAL)
    merged, union = _build_halves_and_union(tmp_path, _corpus(seed=9), cfg)
    _assert_same_searches(merged, union, positional=True)


@pytest.mark.usefixtures("ray_session")
def test_delete_docs_bit_identical(tmp_path):
    """delete_docs(full, odd ids) must equal a fresh build over the
    even half — for the positional config too (positions re-encoded)."""
    from searchengine_ray.build.merge_indexes import delete_docs

    import pyarrow.compute as pc

    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None,
                      ranker=RankerType.BM25_OPTIMIZED,
                      posting_type=PostingType.POSITIONAL)
    corpus = _corpus(seed=13)
    full_p = str(tmp_path / "all.parquet")
    even_p = str(tmp_path / "even.parquet")
    pq.write_table(corpus, full_p)
    pq.write_table(
        corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 0)),
        even_p)
    full_i, even_i = str(tmp_path / "ifull"), str(tmp_path / "ieven")
    build_index(full_p, full_i, cfg, id_column="doc_id",
                text_column="text", url_column="url")
    build_index(even_p, even_i, cfg, id_column="doc_id",
                text_column="text", url_column="url")
    deleted = str(tmp_path / "ideleted")
    odd = [i for i in range(corpus.num_rows) if i % 2]
    delete_docs(full_i, deleted, odd)
    _assert_same_searches(deleted, even_i, positional=True)
    # deleted docs are gone from the docmap too
    s = Searcher(deleted)
    with pytest.raises(KeyError):
        s.doc_terms(1)


@pytest.mark.usefixtures("ray_session")
def test_delete_nothing_is_identity(tmp_path):
    from searchengine_ray.build.merge_indexes import delete_docs

    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None)
    corpus = _corpus(120, seed=3)
    p = str(tmp_path / "c.parquet")
    pq.write_table(corpus, p)
    idx = str(tmp_path / "i")
    build_index(p, idx, cfg, id_column="doc_id", text_column="text",
                url_column="url")
    out = str(tmp_path / "o")
    delete_docs(idx, out, [10_000, 10_001])   # ids not in the corpus
    _assert_same_searches(out, idx)


@pytest.mark.usefixtures("ray_session")
def test_shared_doc_ids_refused(tmp_path):
    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None)
    corpus = _corpus(100)
    p = str(tmp_path / "c.parquet")
    pq.write_table(corpus, p)
    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(p, idx1, cfg, id_column="doc_id", text_column="text",
                url_column="url")
    build_index(p, idx2, cfg, id_column="doc_id", text_column="text",
                url_column="url")
    with pytest.raises(ValueError, match="disjoint"):
        merge_indexes([idx1, idx2], str(tmp_path / "m"))


@pytest.mark.usefixtures("ray_session")
def test_config_mismatch_refused(tmp_path):
    import pyarrow.compute as pc

    corpus = _corpus(100)
    even = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 0))
    odd = corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"], 1), 1))
    pe, po = str(tmp_path / "e.parquet"), str(tmp_path / "o.parquet")
    pq.write_table(even, pe)
    pq.write_table(odd, po)
    i1, i2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(pe, i1, IndexConfig(num_shards=2, min_token_length=2,
                                    use_stop_words=False, language=None),
                id_column="doc_id", text_column="text", url_column="url")
    build_index(po, i2, IndexConfig(num_shards=2, min_token_length=3,
                                    use_stop_words=False, language=None),
                id_column="doc_id", text_column="text", url_column="url")
    # min_token_length differs → the tokenizer-config guard fires
    with pytest.raises(ValueError, match="differs"):
        merge_indexes([i1, i2], str(tmp_path / "m"))


@pytest.mark.usefixtures("ray_session")
def test_federated_bit_identical(tmp_path):
    """Query fan-out over parity-half indexes == one full build,
    bit-exact (scores included); guards fire on semantic mismatch."""
    from searchengine_ray.query.federated import FederatedSearcher

    import pyarrow.compute as pc

    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None)
    corpus = _corpus(seed=21)
    paths = {}
    for name, tbl in (
        ("even", corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"],
                                                        1), 0))),
        ("odd", corpus.filter(pc.equal(pc.bit_wise_and(corpus["doc_id"],
                                                       1), 1))),
        ("all", corpus),
    ):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, p)
        idx = str(tmp_path / f"idx_{name}")
        build_index(p, idx, cfg, id_column="doc_id",
                    text_column="text", url_column="url")
        paths[name] = idx
    fed = FederatedSearcher([paths["even"], paths["odd"]])
    full = Searcher(paths["all"])
    for q in QUERIES:
        a = fed.search(q, 20)
        b = full.search(q, 20, with_urls=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    with pytest.raises(ValueError, match="at least two"):
        FederatedSearcher([paths["all"]])


@pytest.mark.usefixtures("ray_session")
def test_lifecycle_chain(tmp_path):
    """merge → delete → merge again (with a fresh shard) must stay
    bit-identical to a direct build over the surviving union."""
    from searchengine_ray.build.merge_indexes import delete_docs

    import pyarrow.compute as pc

    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None)
    corpus = _corpus(240, seed=31)
    third = corpus.num_rows // 3
    parts = [corpus.slice(0, third), corpus.slice(third, third),
             corpus.slice(2 * third)]
    idxs = []
    for i, t in enumerate(parts):
        p = str(tmp_path / f"p{i}.parquet")
        pq.write_table(t, p)
        idx = str(tmp_path / f"i{i}")
        build_index(p, idx, cfg, id_column="doc_id",
                    text_column="text", url_column="url")
        idxs.append(idx)
    m01 = str(tmp_path / "m01")
    merge_indexes(idxs[:2], m01)
    # delete every doc_id % 4 == 1 from the merged pair
    drop = [i for i in range(2 * third) if i % 4 == 1]
    d01 = str(tmp_path / "d01")
    delete_docs(m01, d01, drop)
    final = str(tmp_path / "final")
    merge_indexes([d01, idxs[2]], final)
    # direct build over the survivors
    keep = corpus.filter(pa.array(
        [not (i < 2 * third and i % 4 == 1)
         for i in range(corpus.num_rows)]))
    kp = str(tmp_path / "keep.parquet")
    pq.write_table(keep, kp)
    direct = str(tmp_path / "direct")
    build_index(kp, direct, cfg, id_column="doc_id",
                text_column="text", url_column="url")
    _assert_same_searches(final, direct)


@pytest.mark.usefixtures("ray_session")
def test_federated_three_way(tmp_path):
    from searchengine_ray.query.federated import FederatedSearcher

    cfg = IndexConfig(num_shards=2, min_token_length=2,
                      use_stop_words=False, language=None)
    corpus = _corpus(240, seed=41)
    idxs = []
    for p in range(3):
        import pyarrow.compute as pc

        part = corpus.filter(pa.array(
            (corpus["doc_id"].to_numpy() % 3 == p)))
        pp = str(tmp_path / f"p{p}.parquet")
        pq.write_table(part, pp)
        idx = str(tmp_path / f"i{p}")
        build_index(pp, idx, cfg, id_column="doc_id",
                    text_column="text", url_column="url")
        idxs.append(idx)
    ap = str(tmp_path / "all.parquet")
    pq.write_table(corpus, ap)
    full = str(tmp_path / "ifull")
    build_index(ap, full, cfg, id_column="doc_id",
                text_column="text", url_column="url")
    fed = FederatedSearcher(idxs)
    fs = Searcher(full)
    for q in QUERIES:
        a, b = fed.search(q, 15), fs.search(q, 15, with_urls=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
