"""Run the REFERENCE engine in-process for differential tests.

Imports ``/root/reference/src`` with ``nltk`` stubbed to our Porter2
stemmer (parity pinned in test_text.py) and ``psutil`` stubbed to a
constant (its only use is the RAM-flush trigger, ``spimi.py:66-74``).

NOT production code — test oracle only.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace


def _install_stubs():
    if "psutil" not in sys.modules:
        psutil = types.ModuleType("psutil")
        psutil.virtual_memory = lambda: SimpleNamespace(
            percent=0.0, total=64 * 2**30, available=32 * 2**30
        )
        # ray's uv runtime-env hook imports psutil opportunistically; a
        # partial stub must still satisfy Process().parents()
        psutil.Process = lambda *a, **k: SimpleNamespace(parents=lambda: [])
        sys.modules["psutil"] = psutil
    if "nltk.stem.snowball" not in sys.modules:
        from searchengine_ray.text.stemmer import stem

        nltk = types.ModuleType("nltk")
        nltk_stem = types.ModuleType("nltk.stem")
        nltk_snow = types.ModuleType("nltk.stem.snowball")

        class SnowballStemmer:
            def __init__(self, language):
                pass

            def stem(self, w):
                return stem(w)

        nltk_snow.SnowballStemmer = SnowballStemmer
        nltk.stem = nltk_stem
        nltk_stem.snowball = nltk_snow
        sys.modules.setdefault("nltk", nltk)
        sys.modules["nltk.stem"] = nltk_stem
        sys.modules["nltk.stem.snowball"] = nltk_snow
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")


def reference_search(
    token_lists: list[list[str]],
    query_tokens: list[str],
    tmpdir: str,
    *,
    ranker_name: str = "BM25",
    posting_type_name: str = "frequency",
    k: float = 1.2,
    b: float = 0.75,
    schema: str = "lnc.ltc",
    n: int = 1000,
    max_block_size: int = 100_000,  # also the merge read-buffer size —
    # huge values make the reference's get_lines_from_block (spimi.py:123)
    # issue that many readline() calls per refill
) -> list[tuple[int, float]]:
    """Index ``token_lists`` (doc_id = list position) with the reference
    SPIMI pipeline, write/reload the index, run one query. Returns
    [(doc_id:int, score:float)] in the reference's output order."""
    _install_stubs()
    import os

    from models.index import InvertedIndex
    from models.posting_list import PostingType
    from models.ranker import RankerFactory, RankingMethod
    from models.spimi import Spimi

    blocks = os.path.join(tmpdir, "blocks")
    os.makedirs(blocks, exist_ok=True)
    out_path = os.path.join(tmpdir, "ref.index")

    method = RankingMethod(ranker_name)
    posting_type = PostingType(posting_type_name)
    ranker = RankerFactory(method)(posting_type, schema=schema, k=k, b=b)
    indexer = Spimi(
        ranker=ranker,
        max_ram_usage=1000,
        max_block_size=max_block_size,
        auxiliary_dir=blocks,
        posting_type=posting_type,
    )
    indexer.extend_metadata(
        {
            "posting_class": posting_type.value,
            "min_token_length": 3,
            "stop_words": None,
            "language": "english",
            "doc_mapping": os.path.join(tmpdir, "docs.map"),
        }
    )
    for doc_id, tokens in enumerate(token_lists):
        indexer.add_document(doc_id=doc_id, tokens=tokens)
    indexer.construct_index(out_path)

    index = InvertedIndex(None, output_path=out_path)
    qranker = RankerFactory(RankingMethod(index.metadata["ranker"]))(
        PostingType(index.metadata["posting_class"])
    )
    results = index.search(list(query_tokens), n, qranker, show_score=True)
    return [(int(doc), float(score)) for doc, score in results]
