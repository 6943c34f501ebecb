"""Reference line-format round-trips + golden-dump equality against the
reference engine's ACTUAL on-disk index file."""

import numpy as np

from searchengine_ray.config import PostingType
from searchengine_ray.query.postings import PostingsRec
from searchengine_ray.state.textformat import parse_term_line, term_line
from searchengine_ray.config import RankerType


def _rec(**kw):
    d = dict(
        term="games", df=2, idf=0.405,
        doc_ids=np.array([0, 3], np.int64),
        tfs=np.array([2, 1], np.int64),
        dls=np.array([5, 7], np.int64),
    )
    d.update(kw)
    return PostingsRec(**d)


def test_frequency_line():
    line = term_line(_rec(), PostingType.FREQUENCY, RankerType.BM25)
    assert line == "games 0:2 3:1"
    back = parse_term_line(line, PostingType.FREQUENCY)
    assert back["docs"] == [0, 3] and back["tfs"] == [2, 1]


def test_boolean_line():
    line = term_line(_rec(), PostingType.BOOLEAN, RankerType.RAW)
    assert line == "games 0 3"
    assert parse_term_line(line, PostingType.BOOLEAN)["docs"] == [0, 3]


def test_weighted_line():
    rec = _rec(weights=np.array([0.7714, 0.0], np.float64))
    line = term_line(rec, PostingType.FREQUENCY, RankerType.TF_IDF)
    assert line == "games 0:2/0.771 3:1/0.0"
    back = parse_term_line(line, PostingType.FREQUENCY, weighted=True)
    assert back["weights"] == [0.771, 0.0]


def test_positional_line_with_idf_suffix():
    rec = _rec(positions=[[0, 4], [2]])
    line = term_line(rec, PostingType.POSITIONAL, RankerType.BM25_OPTIMIZED)
    assert line == "games 0:0,4 3:2"
    back = parse_term_line(line + " #0.405", PostingType.POSITIONAL)
    assert back["positions"] == [[0, 4], [2]]
    assert back["idf"] == 0.405


def test_golden_dump_matches_reference_index_file(ray_session, tmp_path):
    """Build the same corpus with BOTH engines; our dump_index_lines must
    reproduce the reference's merged index file lines verbatim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.build.extract import make_tokenizer
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.state.textformat import dump_index_lines
    from tests.reference_harness import _install_stubs

    texts = [
        "good old games games game",
        "the gaming gamer plays games",
        "caresses ponies ties cats games games games",
    ]
    cfg = IndexConfig(min_token_length=3, use_stop_words=False,
                      language="english", num_shards=2)
    tok = make_tokenizer(cfg)
    token_lists = [tok.tokenize(t) for t in texts]

    _install_stubs()
    import os

    from models.posting_list import PostingType as RefPT
    from models.ranker import RankerFactory, RankingMethod
    from models.spimi import Spimi

    blocks = str(tmp_path / "blocks")
    os.makedirs(blocks)
    ranker = RankerFactory(RankingMethod("BM25"))(RefPT("frequency"),
                                                 k=1.2, b=0.75)
    indexer = Spimi(ranker=ranker, max_ram_usage=1000, max_block_size=100_000,
                    auxiliary_dir=blocks, posting_type=RefPT("frequency"))
    indexer.extend_metadata({"posting_class": "frequency",
                             "min_token_length": 3, "stop_words": None,
                             "language": "english", "doc_mapping": "x"})
    for doc_id, toks in enumerate(token_lists):
        indexer.add_document(doc_id=doc_id, tokens=toks)
    out_path = str(tmp_path / "ref.index")
    indexer.construct_index(out_path)
    ref_lines = open(out_path).read().splitlines()[1:-1]  # strip header/footer

    path = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), path)
    idx = str(tmp_path / "idx")
    build_index(path, idx, cfg)
    s = Searcher(idx)
    all_terms = sorted({t for toks in token_lists for t in toks})
    ours = dump_index_lines(s, all_terms)
    assert ours == sorted(ref_lines)
