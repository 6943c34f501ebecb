"""Differential tests: our Ray engine vs the ACTUAL reference engine
(imported in-process, tests/reference_harness.py) on the same corpus,
same tokens, same ranker parameters. Scores must match bit-exactly —
both sides accumulate per doc in term order over ascending doc ids
(see scorers._fold_scores).

Known reference defects avoided by construction (not replicated):
- D1: the lexicographically first index term can never be fetched →
  queries here avoid the lex-min term (asserted).
- BM25_OPTIMIZED divides by zero for min-dl docs with boost>0 → the
  shortest corpus doc shares no query terms.
"""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.build.pipeline import build_index
from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.build.extract import make_tokenizer
from searchengine_ray.query.engine import Searcher

from tests.reference_harness import reference_search

_BASE = [
    "gaming", "games", "player", "running", "jumped", "happiness",
    "national", "relational", "electricity", "generously", "conditional",
    "apologize", "crying", "meetings", "libraries", "optimization",
    "distributed", "compression", "latency", "throughput", "shuffle",
    "partition", "streaming", "backpressure", "tokenizer", "stemming",
]
# widen the vocabulary so the reference's SPIMI path legitimately spills
# several blocks (flush at max_block_size DISTINCT terms) without
# triggering its D4 zero-buffer defect (blocks must stay < max_block_size)
VOCAB = _BASE + [f"{w}x{i}" for i in range(12) for w in _BASE]


def make_corpus(n_docs=60, seed=7):
    rng = random.Random(seed)
    texts = []
    for i in range(n_docs):
        n = rng.randint(8, 60)
        words = [rng.choice(VOCAB) for _ in range(n)]
        texts.append(" ".join(words))
    # deterministic shortest doc with terms never queried (BM25_OPTIMIZED
    # zero-division guard)
    texts.append("zzzuniquefiller zzzotherfiller zzzthirdfiller")
    return texts


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    texts = make_corpus()
    d = tmp_path_factory.mktemp("diffcorpus")
    path = str(d / "corpus.parquet")
    tbl = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(texts))], pa.string()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    pq.write_table(tbl, path)
    return {"texts": texts, "path": path, "dir": str(d)}


def _token_lists(texts, cfg):
    tok = make_tokenizer(cfg)
    return [tok.tokenize(t) for t in texts]


def _ours(corpus, cfg, query_tokens, n, ray_session, tmp_path, **searcher_kw):
    idx = str(tmp_path / "idx")
    build_index(corpus["path"], idx, cfg, overwrite=True)
    s = Searcher(idx, **searcher_kw)
    doc_ids, scores = s.search_tokens(list(query_tokens), n)
    return list(zip(doc_ids.tolist(), scores.tolist()))


def _canon(results):
    return sorted(results, key=lambda r: (-r[1], r[0]))


QUERY = "games player shuffle partition streaming optimization"


@pytest.mark.parametrize(
    "ranker,posting,ref_ranker,ref_posting,schema,max_block",
    [
        (RankerType.BM25, PostingType.FREQUENCY, "BM25", "frequency", "lnc.ltc", 100_000),
        (RankerType.BM25, PostingType.FREQUENCY, "BM25", "frequency", "lnc.ltc", 120),
        (RankerType.TF_IDF, PostingType.FREQUENCY, "TF_IDF", "frequency", "lnc.ltc", 100_000),
        (RankerType.TF_IDF, PostingType.FREQUENCY, "TF_IDF", "frequency", "nnc.ntn", 100_000),
        (RankerType.TF_IDF, PostingType.FREQUENCY, "TF_IDF", "frequency", "bnn.bpc", 100_000),
        (RankerType.TF_IDF, PostingType.FREQUENCY, "TF_IDF", "frequency", "lnc.npn", 100_000),
        (RankerType.BM25_OPTIMIZED, PostingType.POSITIONAL, "BM25_OPTIMIZED",
         "positional", "lnc.ltc", 100_000),
        (RankerType.TF_IDF_OPTIMIZED, PostingType.POSITIONAL, "TF_IDF_OPTIMIZED",
         "positional", "lnc.ltc", 100_000),
    ],
)
def test_rank_and_score_parity(
    ray_session, tmp_path, corpus, ranker, posting, ref_ranker, ref_posting,
    schema, max_block,
):
    cfg = IndexConfig(
        ranker=ranker, posting_type=posting, smart_schema=schema,
        num_shards=3, k=1.2, b=0.75,
    )
    token_lists = _token_lists(corpus["texts"], cfg)
    query_tokens = make_tokenizer(cfg).tokenize(QUERY)

    # D1 guard: no query term may be the lexicographically first index term
    all_terms = sorted({t for toks in token_lists for t in toks})
    assert all_terms[0] not in query_tokens

    ref = reference_search(
        token_lists, query_tokens, str(tmp_path),
        ranker_name=ref_ranker, posting_type_name=ref_posting,
        schema=schema, n=10_000, max_block_size=max_block,
    )
    ours = _ours(corpus, cfg, query_tokens, 10_000, ray_session, tmp_path)

    ref_c, ours_c = _canon(ref), _canon(ours)
    assert [d for d, _ in ref_c] == [d for d, _ in ours_c]
    for (rd, rs), (od, os_) in zip(ref_c, ours_c):
        assert rs == pytest.approx(os_, abs=1e-12), (rd, rs, os_)


def test_salted_hot_terms_same_results(ray_session, tmp_path, corpus):
    """Skew path: salting head terms across sub-groups must not change
    any score (postings are re-merged at read, global df preserved)."""
    cfg_plain = IndexConfig(num_shards=3)
    cfg_salted = IndexConfig(num_shards=3, hot_salts=4, hot_frac=0.001)
    query_tokens = make_tokenizer(cfg_plain).tokenize(QUERY)

    a = _ours(corpus, cfg_plain, query_tokens, 50, ray_session,
              tmp_path / "plain")
    b = _ours(corpus, cfg_salted, query_tokens, 50, ray_session,
              tmp_path / "salt")
    assert a == b
    # the salted build must actually have exercised the salt path
    from searchengine_ray.build.pipeline import load_manifest

    man = load_manifest(str(tmp_path / "salt" / "idx"))
    assert man["hot_salt_of"], "no hot terms detected"
    assert any(s["salt"] > 0 for s in man["shards"]), "no salted shards"
