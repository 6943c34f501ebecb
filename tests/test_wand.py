"""Block-max WAND: must return bit-identical (doc_id, score) top-k to
the exhaustive TAAT scorer, while actually skipping blocks on skewed
corpora (the point of the optimization)."""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig
from searchengine_ray.build.extract import make_tokenizer
from searchengine_ray.query.engine import Searcher


@pytest.fixture(scope="module")
def skewed_index(tmp_path_factory, ray_session):
    """Corpus with head terms (every doc) + selective terms (few docs) —
    the shape where WAND skips."""
    rng = random.Random(11)
    head = ["common", "shared", "everywhere"]
    mid = [f"mid{i}" for i in range(20)]
    rare = [f"rare{i}" for i in range(20)]
    texts = []
    for i in range(800):
        # head terms in ~half the docs (idf ~0.7, not stopword-zero);
        # rare terms in ~40 docs each, spread across the id range
        words = [rng.choice(head) for _ in range(rng.randint(5, 15))
                 ] if rng.random() < 0.5 else []
        words += [rng.choice(mid) for _ in range(rng.randint(5, 20))]
        if rng.random() < 0.05 * len(rare):
            words += [rng.choice(rare)]
        rng.shuffle(words)
        texts.append(" ".join(words) if words else "filler")
    d = tmp_path_factory.mktemp("wand")
    path = str(d / "corpus.parquet")
    pq.write_table(
        pa.table({
            "url": pa.array([f"u{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.large_string()),
        }),
        path, row_group_size=200,
    )
    idx = str(d / "idx")
    build_index(path, idx, IndexConfig(num_shards=3, min_token_length=2,
                                       use_stop_words=False, language=None))
    return idx


QUERIES = [
    "rare5 common",
    "rare1 rare2 rare3",
    "common shared everywhere",
    "rare7 rare8 shared",
    "missing term rare9",
]


@pytest.mark.parametrize("n", [5, 10, 50])
def test_wand_bit_identical(skewed_index, n):
    taat = Searcher(skewed_index)
    wand = Searcher(skewed_index, use_wand=True)
    for q in QUERIES:
        tokens = taat.tokenizer.tokenize(q)
        d1, s1 = taat.search_tokens(list(tokens), n)
        d2, s2 = wand.search_tokens(list(tokens), n)
        assert d1.tolist() == d2.tolist(), q
        assert s1.tolist() == s2.tolist(), q  # bit-exact


def test_wand_actually_skips(skewed_index):
    wand = Searcher(skewed_index, use_wand=True)
    tokens = wand.tokenizer.tokenize("rare5 common")
    wand.search_tokens(list(tokens), 5)
    st = wand.wand_stats
    # the rare term bounds the threshold high; common-term blocks skip
    assert st["block_skips"] > 0 or st["evaluated"] < 800
