"""Engine configuration — mirrors the reference CLI surface
(``indexer.py:64-152``, ``searcher.py:14-38``) as a dataclass.

Reference defect D5 (SURVEY.md §7): the reference CLI defaults k=0.75,
b=0.5 (swapped); we default to the standard k1=1.2, b=0.75 that the
reference's own smoke test uses (``test.py:45-46``) and record both in
the manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from enum import Enum


class PostingType(str, Enum):
    BOOLEAN = "boolean"
    FREQUENCY = "frequency"
    POSITIONAL = "positional"


class RankerType(str, Enum):
    RAW = "raw"                      # reference Ranker base: score 0
    BM25 = "bm25"
    TF_IDF = "tf_idf"
    BM25_OPTIMIZED = "bm25_optimized"        # + positional proximity boost
    TF_IDF_OPTIMIZED = "tf_idf_optimized"


@dataclass
class IndexConfig:
    # tokenizer (reference --min-token-length --stop-words --language)
    min_token_length: int | None = 3
    use_stop_words: bool = True
    language: str | None = "english"

    # postings / ranker (reference --posting-list-type --ranker --k --b --schema)
    posting_type: PostingType = PostingType.FREQUENCY
    ranker: RankerType = RankerType.BM25
    k: float = 1.2
    b: float = 0.75
    smart_schema: str = "lnc.ltc"    # TF-IDF SMART notation (tf_idf.py:17-24)

    # layout / scale knobs (the SPIMI flush unit is the input fragment)
    num_shards: int = 8              # lexicographic term shards
    extract_concurrency: int | None = None   # None → let Ray size the pool
    hot_salts: int = 1                # >1 → salt head terms across this many sub-groups
    hot_frac: float = 0.01            # sample frequency above which a term is "hot"

    # query
    default_top_k: int = 10

    def to_manifest(self) -> dict:
        d = asdict(self)
        d["posting_type"] = self.posting_type.value
        d["ranker"] = self.ranker.value
        return d

    @staticmethod
    def from_manifest(d: dict) -> "IndexConfig":
        d = dict(d)
        d["posting_type"] = PostingType(d["posting_type"])
        d["ranker"] = RankerType(d["ranker"])
        return IndexConfig(**d)
