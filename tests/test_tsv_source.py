"""Gzip-TSV source conformance vs the reference Parser, plus a Unicode
end-to-end differential (the diff-test corpus is ASCII; this pins the
Python tokenize path through the full build+query)."""

import csv
import gzip

import pytest

from tests.reference_harness import _install_stubs


def _write_tsv(path, rows, header):
    with gzip.open(path, "wt", encoding="utf-8", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(header)
        w.writerows(rows)


@pytest.fixture()
def tsv_file(tmp_path):
    path = str(tmp_path / "reviews.tsv.gz")
    header = ["review_id", "review_headline", "review_body", "stars"]
    rows = [
        ["R1", "Great product", "It works really well", "5"],
        ["R2", "Meh", "quoted \"text\" with, commas", "3"],
        ["R3", "", "body only here", "1"],
        ["R4", "Tab\tinside quoted field is fine", "naïve café résumé", "2"],
    ]
    # csv.writer quotes fields containing the delimiter — same dialect
    # the reference's DictReader parses
    _write_tsv(path, rows, header)
    return path


def test_rows_match_reference_parser(tsv_file):
    _install_stubs()
    from models.parser import Parser

    from searchengine_ray.sources.tsv import parse_tsv_rows

    ref = list(
        Parser(tsv_file, "review_id",
               ["review_headline", "review_body"]).parse("\t")
    )
    ours = list(
        parse_tsv_rows(tsv_file, "review_id",
                       ["review_headline", "review_body"])
    )
    assert ours == ref
    assert ours[0] == ("R1", "Great product It works really well")


def test_read_tsv_corpus_dataset(ray_session, tsv_file, tmp_path):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.tsv import read_tsv_corpus

    ds = read_tsv_corpus([tsv_file], "review_id",
                         ["review_headline", "review_body"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["url"] == "R1"

    # TSV → parquet staging → full engine build (gzip TSV itself is not
    # a random-access fragment format; stage once, then index)
    staged = str(tmp_path / "staged")
    ds.write_parquet(staged)
    idx = str(tmp_path / "idx")
    build_index(staged, idx, IndexConfig(num_shards=2), id_column="doc_id")
    s = Searcher(idx)
    res = s.search("great product", 3)
    assert res.num_rows >= 1
    assert res["url"][0].as_py() == "R1"


def test_unicode_corpus_reference_parity(ray_session, tmp_path):
    """Unicode texts force the per-row Python tokenize path end-to-end;
    scores must still match the reference engine exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.build.extract import make_tokenizer
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from tests.reference_harness import reference_search

    texts = [
        "naïve café résumé gaming games — em-dash…ellipsis",
        "ação çedilha русский games naïve playing",
        "plain ascii games gaming player café",
        "tabs\tbecome\ttokens café games\nnewlines",
        "zzzfiller zzzother",
    ]
    cfg = IndexConfig(num_shards=2)
    tok = make_tokenizer(cfg)
    token_lists = [tok.tokenize(t) for t in texts]
    qt = tok.tokenize("games café naïve")
    ref = reference_search(token_lists, qt, str(tmp_path), n=100)

    path = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))]),
        "text": pa.array(texts, pa.large_string()),
    }), path)
    idx = str(tmp_path / "idx")
    build_index(path, idx, cfg)
    docs, scores = Searcher(idx).search_tokens(list(qt), 100)
    ours = sorted(zip(docs.tolist(), scores.tolist()),
                  key=lambda r: (-r[1], r[0]))
    refc = sorted(ref, key=lambda r: (-r[1], r[0]))
    assert [d for d, _ in ours] == [d for d, _ in refc]
    for (d1, s1), (d2, s2) in zip(ours, refc):
        assert s1 == pytest.approx(s2, abs=1e-12)


def test_tsv_to_index_end_to_end(ray_session, tmp_path):
    """The reference's full ingest path: gzip-TSV -> parquet pages ->
    index -> search returns the TSV's external ids as urls."""
    import gzip

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.tsv import tsv_to_pages_parquet

    tsv = tmp_path / "reviews.tsv.gz"
    rows = [
        "review_id\treview_headline\treview_body",
        "R1\tgreat game\tthe game plays great and runs fast",
        "R2\tslow start\tthe game starts slow but ends fast",
        "R3\tother topic\tcooking recipes and kitchen tools",
    ]
    with gzip.open(tsv, "wt", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")

    pages = tsv_to_pages_parquet(
        [str(tsv)], str(tmp_path / "pages"),
        doc_id_column="review_id",
        columns=["review_headline", "review_body"],
    )
    assert pages
    idx = str(tmp_path / "idx")
    build_index(pages, idx, IndexConfig(num_shards=2))
    res = Searcher(idx).search("fast game", 3)
    urls = res["url"].to_pylist()
    assert set(urls) <= {"R1", "R2", "R3"}
    assert "R1" in urls and "R3" not in urls
