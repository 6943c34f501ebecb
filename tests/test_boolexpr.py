"""Boolean expression retrieval: parser edge cases, corpus-side vs
naive, and index-side vs corpus-side agreement on the same corpus."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.query.boolexpr import (
    BoolParseError,
    boolean_search_batch,
    parse,
)

TEXTS = [
    "fast spark merge",          # 0
    "fast merge join",           # 1
    "spark merge",               # 2
    "fast join",                 # 3
    "merge",                     # 4
    "slow scan",                 # 5
    "fast spark merge join",     # 6
]


def _simple_toks(text):
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return {t for t in toks if len(t) >= 2}


def _naive(expr, texts):
    ast = parse(expr)

    def ev(node, s):
        if node[0] == "term":
            return node[1] in s
        if node[0] == "not":
            return not ev(node[1], s)
        a, b = ev(node[1], s), ev(node[2], s)
        return (a and b) if node[0] == "and" else (a or b)

    return [d for d, t in enumerate(texts) if ev(ast, _simple_toks(t))]


EXPRS = [
    "(fast OR spark) AND merge NOT join",
    "fast spark",                        # juxtaposition = AND
    "NOT (fast OR spark OR merge)",      # pure complement
    "merge NOT (fast AND join)",
    "fast AND NOT join OR spark",
]


@pytest.mark.parametrize("expr", EXPRS)
def test_corpus_side_matches_naive(expr):
    batch = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })
    got = boolean_search_batch(batch, parse(expr))["doc_id"].to_pylist()
    assert got == _naive(expr, TEXTS), expr


def test_parser_errors():
    for bad in ["", "AND fast", "fast OR", "(fast", "fast)", "fast ) x"]:
        with pytest.raises(BoolParseError):
            parse(bad)


@pytest.mark.parametrize("expr", EXPRS)
def test_index_side_matches_corpus_side(ray_session, tmp_path, expr):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    sub = tmp_path / re.sub(r"\W", "_", expr)[:30]
    sub.mkdir()
    src = str(sub / "pages.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"https://t/{i}" for i in range(len(TEXTS))]),
        "text": pa.array(TEXTS, pa.string()),
    }), src)
    idx = str(sub / "idx")
    build_index(src, idx, IndexConfig(
        num_shards=2, use_stop_words=False, min_token_length=2,
        language=None,
    ))
    got = Searcher(idx).search_boolean_expr(expr)["doc_id"].to_pylist()
    assert got == _naive(expr, TEXTS), expr


@pytest.mark.usefixtures("ray_session")
def test_percolate_matches_per_query_boolean_search():
    import ray

    from searchengine_ray.query.boolexpr import boolean_search, percolate

    texts = ["fast spark merge", "slow merge join", "stream data",
             "window stream fast", "data engine query", "merge fast"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    exprs = ["fast AND merge", "stream OR engine", "merge NOT join"]
    got = percolate(ds, exprs).to_pandas()
    pairs = {(r.doc_id, r.query_id) for r in got.itertuples()}
    want = set()
    for qid, e in enumerate(exprs):
        for d in boolean_search(ds, e).to_pandas()["doc_id"]:
            want.add((d, qid))
    assert pairs == want
    assert (0, 0) in pairs and (1, 2) not in pairs


@pytest.mark.usefixtures("ray_session")
def test_phrase_percolation():
    import ray

    from searchengine_ray.query.boolexpr import (
        BoolParseError,
        boolean_search,
        parse,
        percolate,
        to_sql_condition,
    )

    texts = ["fast spark merge", "spark fast merge", "fast spark",
             "merge only here", "the fast Spark! merge"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    # phrase = consecutive in order: docs 0, 2, 4 ('fast spark'); doc 1
    # has both words but reversed
    got = sorted(boolean_search(ds, '"fast spark"').to_pandas()
                 ["doc_id"].tolist())
    assert got == [0, 2, 4]
    pairs = {(r["doc_id"], r["query_id"])
             for r in percolate(ds, ['"fast spark" AND merge',
                                     'merge NOT "fast spark"'])
             .take_all()}
    assert pairs == {(0, 0), (4, 0), (1, 1), (3, 1)}
    # the SQL condition mirrors the same semantics structurally
    cond = to_sql_condition(parse('"fast spark"'))
    assert "toks[i + 0] = 'fast'" in cond and "toks[i + 1] = 'spark'" \
        in cond
    # index-side boolean retrieval refuses phrases loudly
    from searchengine_ray.query.boolexpr import _tokenize_ast

    with pytest.raises(BoolParseError, match="corpus-side"):
        _tokenize_ast(parse('"fast spark"'), lambda s: [s])
    # degenerate phrases: one word → term; empty/stop-length → none
    assert parse('"fast"') == ("term", "fast")
    assert parse('"a b"') == ("none",)


@pytest.mark.usefixtures("ray_session")
def test_near_operator():
    import ray

    from searchengine_ray.query.boolexpr import (
        BoolParseError,
        boolean_search,
        parse,
    )

    texts = ["fast one two merge", "fast one two three merge",
             "merge then later fast", "fast alone", "merge xx fast"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    # distance: doc0 = 3, doc1 = 4, doc2 = 3, doc4 = 2 (order-free)
    got = sorted(boolean_search(ds, "fast NEAR/3 merge").to_pandas()
                 ["doc_id"].tolist())
    assert got == [0, 2, 4]
    got2 = sorted(boolean_search(ds, "fast NEAR/2 merge").to_pandas()
                  ["doc_id"].tolist())
    assert got2 == [4]
    # NEAR binds two plain terms only
    with pytest.raises(BoolParseError, match="plain terms"):
        parse('(a AND b) NEAR/2 c')
    # doc-boundary windows never leak across docs (doc3 'fast alone'
    # adjacent in the flat stream to doc4's 'merge')
    assert 3 not in got
