"""JSONL(.gz) source: field joining, missing fields, deterministic
composite doc ids, and end-to-end ingest → index → search."""

import gzip
import json

import pytest

from searchengine_ray.sources.jsonl import (
    jsonl_to_pages_parquet,
    read_jsonl_corpus,
)

ROWS_A = [
    {"url": "https://a/0", "title": "alpha beta", "body": "gamma"},
    {"url": "https://a/1", "title": "delta", "body": None},
    {"title": "no url row", "body": "epsilon"},
]
ROWS_B = [
    {"url": "https://b/0", "title": "zeta", "body": "eta theta"},
]


def _write(tmp_path):
    pa_ = tmp_path / "a.jsonl.gz"
    with gzip.open(pa_, "wt", encoding="utf-8") as f:
        for r in ROWS_A:
            f.write(json.dumps(r) + "\n")
    pb = tmp_path / "b.jsonl"
    with open(pb, "w", encoding="utf-8") as f:
        for r in ROWS_B:
            f.write(json.dumps(r) + "\n")
    return [str(pa_), str(pb)]


def test_read_jsonl_corpus(ray_session, tmp_path):
    paths = _write(tmp_path)
    rows = sorted(
        read_jsonl_corpus(paths, ["title", "body"]).take_all(),
        key=lambda r: r["doc_id"],
    )
    # files sorted: a.jsonl.gz is fidx 0, b.jsonl is fidx 1
    assert [r["text"] for r in rows] == [
        "alpha beta gamma", "delta ", "no url row epsilon",
        "zeta eta theta",
    ]
    assert [r["url"] for r in rows] == [
        "https://a/0", "https://a/1", "", "https://b/0",
    ]
    assert rows[3]["doc_id"] == 1 << 40


def test_jsonl_ingest_to_search(ray_session, tmp_path):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    paths = _write(tmp_path)
    pages = jsonl_to_pages_parquet(paths, str(tmp_path / "pages"),
                                   ["title", "body"])
    assert pages
    idx = str(tmp_path / "idx")
    build_index(pages, idx, IndexConfig(
        num_shards=2, use_stop_words=False, min_token_length=2,
        language=None,
    ))
    res = Searcher(idx).search("alpha gamma", 5)
    assert res.num_rows >= 1
    assert res["url"][0].as_py() == "https://a/0"
