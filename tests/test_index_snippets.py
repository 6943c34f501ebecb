"""Index-backed snippets: positions from the positional index must
reproduce a naive best-window recompute over the searcher's own
tokenizer output, and ranks/scores must be identical to plain search."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(tmp_path, texts, positional=True):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig, PostingType

    tbl = pa.table({
        "url": pa.array([f"https://t/{i}" for i in range(len(texts))],
                        pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        posting_type=(PostingType.POSITIONAL if positional
                      else PostingType.FREQUENCY),
        num_shards=2, use_stop_words=False, min_token_length=2,
        language=None,
    ))
    return idx


TEXTS = [
    "alpha beta gamma alpha xx yy beta",
    "alpha xx xx xx xx xx xx xx xx beta",   # terms too far apart for w=4
    "gamma gamma gamma",
    "beta alpha beta alpha",
    "zz ww qq",                             # no query term
]


def _naive_best(tokenizer, text, qtokens, width):
    toks = tokenizer.tokenize(text)
    quniq = list(dict.fromkeys(qtokens))
    hits = [(p, t) for p, t in enumerate(toks) if t in quniq]
    best = None
    for p, _ in hits:
        cov = len({t for q, t in hits if p <= q < p + width})
        if best is None or cov > best[1]:
            best = (p, cov)
    return best or (-1, 0)


@pytest.mark.parametrize("width", [2, 4, 10])
def test_index_snippets_match_naive(ray_session, tmp_path, width):
    from searchengine_ray.query.engine import Searcher

    sub = tmp_path / f"w{width}"
    sub.mkdir()
    idx = _build(sub, TEXTS)
    s = Searcher(idx)
    query = "alpha beta"
    plain = s.search(query, 10, with_urls=False)
    got = s.search_snippets(query, 10, width=width)
    assert got["rank"].to_pylist() == plain["rank"].to_pylist()
    assert got["doc_id"].to_pylist() == plain["doc_id"].to_pylist()
    assert got["score"].to_pylist() == plain["score"].to_pylist()
    qtokens = s.tokenizer.tokenize(query)
    for row in got.to_pylist():
        start, cov = _naive_best(
            s.tokenizer, TEXTS[row["doc_id"]], qtokens, width)
        assert (row["win_start"], row["n_terms"]) == (start, cov), row


def test_index_snippets_duplicate_query_terms(ray_session, tmp_path):
    """'alpha alpha' collapses to one distinct term: coverage maxes at 1."""
    from searchengine_ray.query.engine import Searcher

    s = Searcher(_build(tmp_path, TEXTS))
    got = s.search_snippets("alpha alpha", 10, width=4)
    assert set(got["n_terms"].to_pylist()) <= {1}
    assert got.num_rows > 0


def test_index_snippets_require_positional(ray_session, tmp_path):
    from searchengine_ray.query.engine import Searcher

    s = Searcher(_build(tmp_path, TEXTS, positional=False))
    with pytest.raises(ValueError, match="positional"):
        s.search_snippets("alpha beta", 5)
