"""Ray-Data-native full-text index build + BM25/TF-IDF query engine,
with web-scale corpus-curation pipelines. See README.md / COVERAGE.md."""

from searchengine_ray.config import IndexConfig, PostingType, RankerType

__all__ = [
    "IndexConfig",
    "PostingType",
    "RankerType",
    "build_index",
    "Searcher",
]


def build_index(*args, **kwargs):
    from searchengine_ray.build.pipeline import build_index as _b

    return _b(*args, **kwargs)


def Searcher(*args, **kwargs):  # noqa: N802 — factory mirroring the class
    from searchengine_ray.query.engine import Searcher as _S

    return _S(*args, **kwargs)
