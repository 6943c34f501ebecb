"""BM25F per-field ranking: the w_title=0 degeneration to plain BM25
must be BIT-exact (same idf, same normalization quantization), titles
must actually boost, and the title derivation must match its SQL
oracle expression byte-for-byte."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.query.bm25f import Bm25fSearcher, derive_title_batch

DOCS = [
    "stream engine merges sorted runs of postings into shards",
    "merge policies and compaction of sorted runs",
    "totally unrelated cooking recipe with tomatoes and basil",
    "postings lists compress well with delta gaps",
    "the stream table joins happen before the merge stage",
    "sorted strings tables and log structured merge trees",
    # title-boost pair: 'keyword' beyond the 5-token title in doc 6
    # (shorter body), inside it in doc 7 (longer body)
    "alpha beta gamma delta epsilon zeta eta theta keyword",
    "keyword alpha beta gamma delta epsilon zeta eta theta iota",
]


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig

    d = tmp_path_factory.mktemp("bm25f")
    body = str(d / "body.parquet")
    docs = pa.table({
        "doc_id": pa.array(range(len(DOCS)), pa.int64()),
        "text": pa.array(DOCS, pa.string()),
    })
    pq.write_table(docs, body)
    titles = str(d / "titles.parquet")
    pq.write_table(derive_title_batch(docs), titles)
    cfg = IndexConfig(num_shards=2)
    bidx, tidx = str(d / "bidx"), str(d / "tidx")
    build_index(body, bidx, cfg, id_column="doc_id",
                text_column="text", url_column=None)
    build_index(titles, tidx, cfg, id_column="doc_id",
                text_column="text", url_column=None)
    return bidx, tidx


def test_title_weight_zero_equals_bm25(indexes):
    """idf·(tf/B)(k+1)/(tf/B+k) == idf·tf(k+1)/(tf+k·B) algebraically;
    in floats the two association orders differ by at most an ulp, so
    rankings must match and scores agree to ~1e-14 relative."""
    import math

    from searchengine_ray.query.engine import Searcher

    bidx, tidx = indexes
    plain = Searcher(bidx)
    f = Bm25fSearcher(bidx, tidx, w_body=1.0, w_title=0.0)
    for q in ("sorted merge runs", "postings compress", "stream table",
              "tomatoes", "keyword"):
        a = plain.search(q, 8, with_urls=False)
        b = f.search(q, 8, with_urls=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        for sa, sb in zip(a["score"].to_pylist(), b["score"].to_pylist()):
            assert math.isclose(sa, sb, rel_tol=1e-13), (q, sa, sb)


def test_title_boost_reorders(indexes):
    """'keyword' sits beyond doc 6's 5-token title but inside doc 7's;
    with w_title=0 the shorter doc 6 wins on length normalization,
    with a positive title weight doc 7 overtakes it."""
    bidx, tidx = indexes
    flat = Bm25fSearcher(bidx, tidx, w_body=1.0, w_title=0.0)
    t0 = flat.search("keyword", 8, with_urls=False)
    assert t0["doc_id"].to_pylist() == [6, 7]
    boosted = Bm25fSearcher(bidx, tidx, w_body=1.0, w_title=3.0)
    t1 = boosted.search("keyword", 8, with_urls=False)
    assert t1["doc_id"].to_pylist() == [7, 6]


def test_missing_term_and_empty_query(indexes):
    bidx, tidx = indexes
    f = Bm25fSearcher(bidx, tidx)
    assert f.search("zzzzunknown", 5, with_urls=False).num_rows == 0
    assert f.search("", 5, with_urls=False).num_rows == 0


def test_derive_title_matches_sql():
    import duckdb

    from searchengine_ray.oracles import sql_title_expr

    texts = [
        "one two three four five six seven",
        "  leading   whitespace then words go here",
        "short",
        "",
        "tabs\tand\nnewlines count as whitespace separators too",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = derive_title_batch(t)["text"].to_pylist()
    con = duckdb.connect()
    con.register("documents", t)
    want = [r[0] for r in con.sql(
        f"SELECT {sql_title_expr(5)} FROM documents ORDER BY doc_id"
    ).fetchall()]
    con.close()
    assert got == want


def test_mismatched_corpora_refused(ray_session, tmp_path):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig

    body = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta"], pa.string()),
    }), body)
    small = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha"], pa.string()),
    }), small)
    bidx, sidx = str(tmp_path / "bi"), str(tmp_path / "si")
    build_index(body, bidx, IndexConfig(num_shards=1), id_column="doc_id",
                text_column="text", url_column=None)
    build_index(small, sidx, IndexConfig(num_shards=1),
                id_column="doc_id", text_column="text", url_column=None)
    with pytest.raises(ValueError, match="different corpora"):
        Bm25fSearcher(bidx, sidx)
