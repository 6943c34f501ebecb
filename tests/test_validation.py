"""Guard rails added after round 1 (VERDICT wrong #1, ADVICE items):
unsupported stemmer languages fail loudly, query-time ranker overrides
are validated against the stored index, resuming into an out_dir with a
different config refuses, and WAND falls back to exhaustive scoring
outside its bound-validity range (0 <= b <= 1, k >= 0).
"""

import numpy as np
import pytest

from searchengine_ray.config import IndexConfig, PostingType, RankerType
from searchengine_ray.text.tokenizer import Tokenizer


def test_unsupported_language_raises():
    with pytest.raises(ValueError, match="unsupported stemmer language"):
        Tokenizer(language="klingon")
    Tokenizer(language="english")  # ok (Porter2)
    Tokenizer(language="finnish")  # ok (Snowball Finnish, round 4)
    Tokenizer(language="porter")   # ok (original Porter 1980)
    Tokenizer(language="german")   # ok (Snowball German)
    Tokenizer(language="arabic")   # ok (Snowball Arabic, round 5)
    Tokenizer(language=None)       # ok (no stemming)


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.sources.pages import unit_pages

    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("validation")
    src = str(d / "pages.parquet")
    pq.write_table(unit_pages(), src)
    idx = str(d / "idx")
    build_index(src, idx, IndexConfig(num_shards=2))
    return src, idx


def test_ranker_override_family_mismatch(small_index):
    from searchengine_ray.query.engine import Searcher

    _, idx = small_index
    with pytest.raises(ValueError, match="not compatible"):
        Searcher(idx, ranker=RankerType.TF_IDF)
    with pytest.raises(ValueError, match="positional postings"):
        Searcher(idx, ranker=RankerType.BM25_OPTIMIZED)
    Searcher(idx, ranker=RankerType.RAW)  # raw accepts any index
    Searcher(idx)                         # no override


def test_resume_config_mismatch_raises(small_index):
    from searchengine_ray.build.pipeline import build_index

    src, idx = small_index
    # same config resumes fine (everything skipped)
    build_index(src, idx, IndexConfig(num_shards=2))
    with pytest.raises(ValueError, match="different config"):
        build_index(src, idx, IndexConfig(num_shards=2,
                                          ranker=RankerType.TF_IDF))
    # overwrite=True rebuilds from scratch
    build_index(src, idx, IndexConfig(num_shards=2), overwrite=True)


def test_wand_out_of_range_b_falls_back(small_index):
    from searchengine_ray.query.engine import Searcher

    _, idx = small_index
    exhaustive = Searcher(idx, b=1.5)
    wand = Searcher(idx, b=1.5, use_wand=True)
    assert wand.use_wand is False  # bounds invalid for b > 1 → fallback
    d1, s1 = exhaustive.search_tokens(["game", "player"], 5)
    d2, s2 = wand.search_tokens(["game", "player"], 5)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_manifest_records_supported_languages(small_index):
    from searchengine_ray.build.pipeline import load_manifest

    _, idx = small_index
    m = load_manifest(idx)
    assert m["tokenizer"]["supported_languages"] == \
        ["arabic", "danish", "dutch", "english", "finnish", "french",
         "german", "hungarian", "italian", "norwegian", "porter",
         "portuguese", "romanian", "russian", "spanish", "swedish"]


def test_consolidated_reduce_equivalence(ray_session, tmp_path):
    """Hierarchical spill consolidation (round-2 fan-in fix) must not
    change a single byte of the index: build once directly and once
    through a consolidation wave over a many-fragment corpus, then
    compare every shard table and the search results."""
    import pyarrow.parquet as pq

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import unit_pages

    base = unit_pages()
    src = tmp_path / "many"
    src.mkdir()
    for i in range(24):  # 24 files -> 24 fragments
        pq.write_table(base, src / f"part-{i:03d}.parquet")

    cfg = IndexConfig(num_shards=2)
    m_direct = build_index(str(src), str(tmp_path / "direct"), cfg,
                           consolidate_above=10**9)
    m_cons = build_index(str(src), str(tmp_path / "cons"), cfg,
                         consolidate_above=8, consolidate_factor=4)
    assert m_cons["metrics"].get("consolidate_waves") == 1
    assert m_cons["metrics"]["merge_fan_in"] <= 6  # ceil(24/4)
    assert m_direct["metrics"]["merge_fan_in"] == 24

    shards_a = {s["file"].split("/")[-1]: s for s in m_direct["shards"]}
    shards_b = {s["file"].split("/")[-1]: s for s in m_cons["shards"]}
    assert shards_a.keys() == shards_b.keys()
    for name in shards_a:
        ta = pq.read_table(shards_a[name]["file"])
        tb = pq.read_table(shards_b[name]["file"])
        assert ta.equals(tb), name

    for q in ("game player", "good old games"):
        ra = Searcher(str(tmp_path / "direct")).search(q, 5)
        rb = Searcher(str(tmp_path / "cons")).search(q, 5)
        assert ra.equals(rb)


def test_positional_boost_pruning_is_score_preserving(ray_session,
                                                      tmp_path_factory):
    """Pruned boost evaluation (top_n set) must return bit-identical
    top-k to the exhaustive evaluation (top_n=None) — same contract as
    WAND."""
    import numpy as np

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.query.scorers import top_k

    d = tmp_path_factory.mktemp("posprune")
    idx = str(d / "idx")
    build_index(
        "/root/testdata/sf0.001/documents.parquet", idx,
        IndexConfig(num_shards=2, posting_type=PostingType.POSITIONAL,
                    ranker=RankerType.BM25_OPTIMIZED,
                    min_token_length=2, use_stop_words=False, language=None),
        id_column="doc_id", text_column="text", url_column=None,
    )
    s = Searcher(idx)
    for q in ("fast spark join merge", "query vector stream window"):
        tokens = s.tokenizer.tokenize(q)
        recs = s.reader.fetch(tokens)
        d_full, s_full = s.scorer.score(tokens, recs, top_n=None)
        df10, sf10 = top_k(d_full, s_full, 10)
        dp10, sp10 = s.search_tokens(tokens, 10)  # pruned path
        np.testing.assert_array_equal(df10, dp10)
        np.testing.assert_array_equal(sf10, sp10)


def test_boolean_at_rest_format(ray_session, tmp_path):
    """Boolean indexes use a genuinely smaller at-rest layout (doc ids
    only — reference boolean_posting_list.py:38-39) and serve the same
    doc sets as a frequency index queried with the RAW ranker."""
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import unit_pages

    src = str(tmp_path / "pages.parquet")
    pq.write_table(unit_pages(), src)

    with pytest.raises(ValueError, match="boolean"):
        build_index(src, str(tmp_path / "bad"),
                    IndexConfig(posting_type=PostingType.BOOLEAN,
                                num_shards=2))

    cfg_b = IndexConfig(posting_type=PostingType.BOOLEAN,
                        ranker=RankerType.RAW, num_shards=2)
    cfg_f = IndexConfig(ranker=RankerType.RAW, num_shards=2)
    mb = build_index(src, str(tmp_path / "bool"), cfg_b)
    mf = build_index(src, str(tmp_path / "freq"), cfg_f)

    size_b = sum(os.path.getsize(s["file"]) for s in mb["shards"])
    size_f = sum(os.path.getsize(s["file"]) for s in mf["shards"])
    assert size_b < size_f  # the boolean layout is smaller at rest

    sb = Searcher(str(tmp_path / "bool"))
    sf = Searcher(str(tmp_path / "freq"))
    for q in ("game player", "games"):
        tokens = sb.tokenizer.tokenize(q)
        db, _ = sb.search_tokens(tokens, 100)
        df, _ = sf.search_tokens(tokens, 100)
        assert sorted(set(db.tolist())) == sorted(set(df.tolist()))
        assert len(db) > 0


def test_incremental_append_rebuilds_shards_reuses_tokenize(ray_session,
                                                            tmp_path):
    """Appending input files to an existing out_dir must (a) reuse the
    old fragments' tokenize checkpoints, (b) rebuild the shards (idf/N
    change with the corpus), and (c) produce byte-identical results to
    a fresh build. Round 1 silently served STALE shards here."""
    import pyarrow.parquet as pq

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import unit_pages

    base = unit_pages()
    src = tmp_path / "corpus"
    src.mkdir()
    pq.write_table(base.slice(0, 3), src / "a.parquet")
    pq.write_table(base.slice(3, 2), src / "b.parquet")

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_shards=2)
    build_index(str(src), idx, cfg)
    n1 = Searcher(idx).manifest["corpus"]["n_docs"]

    # append a third file (sorts after -> old offsets unchanged)
    pq.write_table(base.slice(5, 1), src / "c.parquet")
    m2 = build_index(str(src), idx, cfg)
    assert m2["metrics"]["tokenize_fragments_resumed"] == 2  # a, b reused
    assert m2["corpus"]["n_docs"] == n1 + 1

    fresh = str(tmp_path / "fresh")
    m3 = build_index(str(src), fresh, cfg)
    sa = {s["file"].split("/")[-1]: s["file"] for s in m2["shards"]}
    sb = {s["file"].split("/")[-1]: s["file"] for s in m3["shards"]}
    assert sa.keys() == sb.keys()
    for name in sa:
        assert pq.read_table(sa[name]).equals(pq.read_table(sb[name])), name
    ra = Searcher(idx).search("game player", 5)
    rb = Searcher(fresh).search("game player", 5)
    assert ra.equals(rb)


def test_search_dataset_dedups_identical_queries(small_index):
    """The serving actor scores each distinct query string once per
    batch and fans the result out per query_id — output must be
    identical to per-query scoring."""
    import ray.data

    from searchengine_ray.query.engine import Searcher, search_dataset

    _, idx = small_index
    qtbl = [{"query_id": i, "query": "games" if i % 2 else "gaming cafe"}
            for i in range(12)]
    rows = search_dataset(
        ray.data.from_items(qtbl), idx, n=5, concurrency=2, batch_size=6,
    ).take_all()
    s = Searcher(idx)
    want = {q: s.search(q, 5).to_pylist() for q in ("games", "gaming cafe")}
    for i in range(12):
        got = sorted(
            ((r["rank"], r["doc_id"], r["score"]) for r in rows
             if r["query_id"] == i)
        )
        expect = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in want["games" if i % 2 else "gaming cafe"]
        )
        assert got == expect, i


def test_search_dataset_warm_broadcast_identical(small_index):
    """warm_queries prewarms the posting cache once on the driver and
    broadcasts it to every serving actor — results must be identical
    to the cold pool, including for queries NOT in the warm set."""
    import ray.data

    from searchengine_ray.query.engine import search_dataset

    _, idx = small_index
    qtbl = [{"query_id": i, "query": "games" if i % 2 else "gaming cafe"}
            for i in range(12)]
    cold = search_dataset(
        ray.data.from_items(qtbl), idx, n=5, concurrency=2, batch_size=6,
    ).take_all()
    warm = search_dataset(
        ray.data.from_items(qtbl), idx, n=5, concurrency=2, batch_size=6,
        warm_queries=["games"],           # half the workload prewarmed
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score"])
    assert sorted(map(key, cold)) == sorted(map(key, warm))


def test_search_dataset_result_cache_identical(small_index):
    """The cross-batch result LRU must not change any output, and the
    LRU must evict (size 1) without affecting results."""
    import ray.data

    from searchengine_ray.query.engine import search_dataset

    _, idx = small_index
    qtbl = [{"query_id": i,
             "query": ["games", "gaming cafe", "player"][i % 3]}
            for i in range(18)]
    base = search_dataset(
        ray.data.from_items(qtbl), idx, n=5, concurrency=2, batch_size=3,
    ).take_all()
    memo = search_dataset(
        ray.data.from_items(qtbl), idx, n=5, concurrency=2, batch_size=3,
        result_cache_size=1,          # constant eviction churn
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score"])
    assert sorted(map(key, base)) == sorted(map(key, memo))


def test_build_with_64bit_external_ids(ray_session, tmp_path):
    """ADVICE r03 (medium): a corpus with < 2^31 rows but 64-bit
    external ids (hash/snowflake) must not crash the int32 spill
    narrowing — doc32 is gated on the actual id domain via parquet
    footer statistics, not the planned row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import unit_pages

    pages = unit_pages()
    big = 2**40
    ids = pa.array([big + 7 * i for i in range(pages.num_rows)], pa.int64())
    src = str(tmp_path / "pages64.parquet")
    pq.write_table(pages.append_column("ext_id", ids), src)
    idx = str(tmp_path / "idx64")
    build_index(src, idx, IndexConfig(num_shards=2), id_column="ext_id")
    s = Searcher(idx)
    hits = s.search("games", 3)
    assert hits.num_rows > 0
    assert all(d >= big for d in hits["doc_id"].to_pylist())


def test_spill_schema_guard_purges_on_flip(tmp_path):
    """A doc32 flip between resumes purges stale spill parquet instead
    of mixing int32/int64 spill schemas in the reduce (ADVICE r03)."""
    import os

    from searchengine_ray.build.pipeline import _sync_spill_schema

    spill = tmp_path / "spill"
    spill.mkdir()
    junk = spill / "spill-000000000000-5.parquet"
    junk.write_bytes(b"x")
    # pre-marker spills have unknown schema → purged once
    _sync_spill_schema(str(spill), doc32=True)
    assert not junk.exists()
    junk.write_bytes(b"x")
    # same schema → spills kept
    _sync_spill_schema(str(spill), doc32=True)
    assert junk.exists()
    # flip → purged
    _sync_spill_schema(str(spill), doc32=False)
    assert not junk.exists()

def test_serving_pool_identical_to_search_dataset(small_index):
    """The persistent ServingPool (steady-state serving surface) must
    return exactly what the per-call pool and the local Searcher
    return — warm broadcast, result LRU, repeated submissions and all
    (round-4, VERDICT r3 item 6)."""
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.query.serving import ServingPool

    _, idx = small_index
    queries = [(i, ["games", "gaming cafe", "player"][i % 3])
               for i in range(18)]
    s = Searcher(idx)
    want = {q: s.search(q, 5).to_pylist()
            for q in ("games", "gaming cafe", "player")}
    with ServingPool(idx, n=5, size=2, batch_size=4,
                     warm_queries=["games"],
                     result_cache_size=8) as pool:
        for _ in range(2):                  # steady state: re-submit
            rows = pool.search(queries).to_pylist()
            for qid, q in queries:
                got = sorted((r["rank"], r["doc_id"], r["score"])
                             for r in rows if r["query_id"] == qid)
                expect = sorted((r["rank"], r["doc_id"], r["score"])
                                for r in want[q])
                assert got == expect, (qid, q)


def test_cli_interactive_search(small_index, monkeypatch, capsys):
    """The interactive loop (reference searcher.py:74-84): queries from
    stdin, 'q' quits, per-query latency line printed."""
    import io

    from searchengine_ray.cli import main

    _, idx = small_index
    monkeypatch.setattr("sys.stdin", io.StringIO("games\nq\n"))
    rc = main(["search", "--search-index", idx, "--n", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "results in" in out          # latency line
    assert "https://" in out            # at least one hit printed
