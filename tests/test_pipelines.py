"""Training-data pipeline operators: dedup, similarity, analysis — plus
build resumability. SQL-checkable operators are compared against DuckDB
in-test at sf0.001 (the driver repeats this at sf0.01)."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "doc_lengths", "postings_tf", "term_df", "top_terms", "bm25_topk",
    "exact_dedup", "quality_stats", "ann_cosine_topk",
    "domain_resample", "sequence_pack", "span_dedup",
])
def test_query_matches_oracle(ray_session, ddb, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    res = e.queries()[name](SF)
    ours = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    theirs = ddb.sql(e.oracle_sql()[name]).df()
    ours, theirs = _canon(ours), _canon(theirs)
    assert list(ours.columns) == list(theirs.columns)
    assert len(ours) == len(theirs)
    import pandas.testing as pdt

    pdt.assert_frame_equal(ours, theirs, check_dtype=False)


def _docs_from(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


NEAR_A = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR_B = "the quick brown fox jumps over the lazy dog and runs far away tonight"
OTHER = "completely different content about database systems and query engines"


def test_minhash_finds_near_dups(ray_session):
    from searchengine_ray.pipelines.dedup import exact_jaccard, minhash_candidates

    rows = [(0, NEAR_A), (1, NEAR_B), (2, OTHER), (3, "tiny"),
            (4, NEAR_A)]  # 4 = exact dup of 0
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_candidates(_docs_from(rows)).take_all()}
    assert (0, 4) in pairs          # exact dup always collides
    assert (0, 1) in pairs or (1, 4) in pairs  # near dup (13/15 shingles)
    assert (2, 3) not in pairs
    j = exact_jaccard(NEAR_A, NEAR_B)
    assert 0.7 < j < 1.0
    assert exact_jaccard(NEAR_A, NEAR_A) == 1.0


def test_simhash_pairs(ray_session):
    from searchengine_ray.pipelines.dedup import simhash_pairs

    rows = [(0, NEAR_A), (1, NEAR_B), (2, OTHER), (4, NEAR_A)]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_pairs(_docs_from(rows)).take_all()}
    assert pairs.get((0, 4)) == 0   # identical text → identical simhash
    assert all(h <= 3 for h in pairs.values())


def test_cosine_topk_matches_bruteforce(ray_session):
    import ray.data

    from searchengine_ray.pipelines.similarity import cosine_topk

    emb = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    t = cosine_topk(ray.data.from_arrow(emb), query_ids=[0, 1], k=3)
    m = np.asarray(emb["embedding"].combine_chunks().values,
                   dtype=np.float64).reshape(emb.num_rows, -1)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    for qid in (0, 1):
        sims = m[ids == qid] @ m.T
        sims = sims[0]
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:3]
        expect = ids[mask][order].tolist()
        got = [r["vec_id"] for r in t.to_pylist() if r["query_id"] == qid]
        assert got == expect


def test_langid(ray_session):
    from searchengine_ray.pipelines.analysis import LangIdStage

    stage = LangIdStage()
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the cat and the dog is in that house with it",
            "der hund und die katze ist nicht mit ein haus",
            "le chat et la maison est dans les rues",
            "xyzzy plugh",
        ], pa.string()),
    })
    out = stage(batch)["lang_pred"].to_pylist()
    assert out == ["en", "de", "fr", "und"]


def test_multimodal_features(ray_session):
    import ray.data

    from searchengine_ray.pipelines.multimodal import (
        BinaryFeatureStage,
        extract_binary_features,
    )

    tbl = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "html": pa.array([b"<html>x</html>", None], pa.binary()),
    })
    out = extract_binary_features(
        ray.data.from_arrow(tbl), column="html", concurrency=1
    ).take_all()
    assert out[0]["payload_bytes"] == 14
    assert out[0]["magic"] == b"<htm".hex()
    assert len(out[0]["features"]) == 8
    assert out[1]["payload_bytes"] == 0
    # determinism: same payload → same features
    s = BinaryFeatureStage(column="html")
    a = s(tbl)["features"].to_pylist()
    b = s(tbl)["features"].to_pylist()
    assert a == b
    with pytest.raises(NotImplementedError):
        BinaryFeatureStage(column="html", decoder="real")(tbl)


def test_multimodal_pluggable_decoder(ray_session):
    """decoder='real' becomes wiring, not a code change: inject a toy
    decode_fn (stands in for a PIL/clip wrapper) and verify it flows
    through both the stage and the Dataset helper (VERDICT r3 item 7)."""
    import ray.data

    from searchengine_ray.pipelines.multimodal import (
        BinaryFeatureStage,
        extract_binary_features,
    )

    def toy_decode(payload: bytes) -> list[float]:
        return [float(len(payload)), float(payload[0])]

    tbl = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "html": pa.array([b"<html>x</html>", None], pa.binary()),
    })
    s = BinaryFeatureStage(column="html", decoder="real",
                           decode_fn=toy_decode, feature_dim=2)
    out = s(tbl)
    assert out["features"].to_pylist() == [
        [14.0, float(b"<"[0])], [0.0, 0.0]]
    out2 = extract_binary_features(
        ray.data.from_arrow(tbl), column="html", concurrency=1,
        decode_fn=toy_decode, feature_dim=2,
    ).take_all()
    assert out2[0]["features"] == [14.0, float(b"<"[0])]
    assert len(out2[1]["features"]) == 2


def test_build_resume(ray_session, tmp_path):
    """Kill-and-resume: removing one shard file and rerunning (no
    overwrite) redoes only the missing shard; tokenized checkpoints are
    skipped; results identical (north rule resumability)."""
    import glob

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import materialize_pages

    pages = materialize_pages(SF, str(tmp_path / "pages"), files=4)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_shards=3)
    build_index(pages, idx, cfg)
    s1 = Searcher(idx)
    r1 = s1.search("fast spark join", 5).to_pydict()

    shard_files = sorted(glob.glob(os.path.join(idx, "shards", "*.parquet")))
    os.remove(shard_files[0])
    tok_mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "tokenized", "*.parquet"))
    }
    m2 = build_index(pages, idx, cfg)  # resume
    assert m2["metrics"]["tokenize_fragments_resumed"] == \
        m2["metrics"]["tokenize_fragments"]
    for f, t in tok_mtimes.items():
        assert os.path.getmtime(f) == t  # untouched
    assert os.path.exists(shard_files[0])  # rebuilt
    r2 = Searcher(idx).search("fast spark join", 5).to_pydict()
    assert r1 == r2


def test_build_resume_after_messy_crash(ray_session, tmp_path):
    """Crash simulation: stale .tmp litter + one missing fragment
    checkpoint + missing manifest → rerun converges to the identical
    index (per-fragment lineage; north rule)."""
    import glob

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher
    from searchengine_ray.sources.pages import materialize_pages

    pages = materialize_pages(SF, str(tmp_path / "pages"), files=4)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_shards=3)
    build_index(pages, idx, cfg)
    r1 = Searcher(idx).search("fast spark join", 5).to_pydict()

    # simulate an interrupted rerun: delete manifest + one checkpoint +
    # one shard, scatter stale .tmp files around
    os.remove(os.path.join(idx, "manifest.json"))
    tok = sorted(glob.glob(os.path.join(idx, "tokenized", "*.parquet")))
    os.remove(tok[1])
    shard = sorted(glob.glob(os.path.join(idx, "shards", "*.parquet")))
    os.remove(shard[-1])
    for d in ("tokenized", "shards"):
        with open(os.path.join(idx, d, "junk.parquet.tmp999"), "w") as f:
            f.write("partial garbage")

    m = build_index(pages, idx, cfg)
    assert m["metrics"]["tokenize_fragments_resumed"] == 3  # 1 of 4 redone
    r2 = Searcher(idx).search("fast spark join", 5).to_pydict()
    assert r1 == r2
    assert not glob.glob(os.path.join(idx, "**", "*.tmp*"), recursive=True)


def test_simhash_adversarial_skew_capped(ray_session):
    """10^2+ docs sharing every band value (identical text) must NOT
    produce an O(n^2) group: the band group truncates to the smallest
    ``max_bucket`` doc ids (VERDICT r1 wrong #2)."""
    from searchengine_ray.pipelines.dedup import simhash_pairs

    rows = [(i, NEAR_A) for i in range(300)]
    pairs = simhash_pairs(_docs_from(rows), max_bucket=50).take_all()
    assert len(pairs) == 50 * 49 // 2  # C(50,2), not C(300,2)
    assert max(max(r["doc_a"], r["doc_b"]) for r in pairs) == 49
    assert all(r["hamming"] == 0 for r in pairs)


def test_bucket_pairs_block_matches_per_group_reference():
    """The vectorized whole-block pair expansion (closed-form rank →
    upper-triangle index) equals running bucket_pairs_group per group,
    across random group sizes straddling the cap."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.pipelines.dedup import (
        bucket_pairs_block,
        bucket_pairs_group,
    )

    rng = np.random.RandomState(7)
    bands, buckets, docs = [], [], []
    next_doc = 0
    layout = []
    for g in range(40):
        size = int(rng.randint(1, 12))          # cap of 5 truncates some
        band, bucket = int(rng.randint(0, 4)), g
        ids = rng.permutation(np.arange(next_doc, next_doc + size))
        next_doc += size
        layout.append((band, bucket, np.sort(ids)))
        bands += [band] * size
        buckets += [bucket] * size
        docs += ids.tolist()
    perm = rng.permutation(len(docs))           # block arrives unsorted
    block = pa.table({
        "band": pa.array(np.asarray(bands)[perm], pa.int32()),
        "bucket": pa.array(np.asarray(buckets)[perm], pa.int64()),
        "doc_id": pa.array(np.asarray(docs)[perm], pa.int64()),
    })
    got = bucket_pairs_block(block, max_bucket=5)
    got_set = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist(),
                      got["trunc"].to_pylist()))
    want = set()
    for band, bucket, ids in layout:
        ref = bucket_pairs_group(
            pa.table({"doc_id": pa.array(ids, pa.int64())}), max_bucket=5
        )
        want |= set(zip(ref["doc_a"].to_pylist(), ref["doc_b"].to_pylist(),
                        ref["trunc"].to_pylist()))
    assert got.num_rows == len(got_set)          # no duplicate emissions
    assert got_set == want


def test_minhash_bucket_cap_flags_truncation():
    """bucket_pairs_group caps oversized buckets and flags it."""
    import pyarrow as pa

    from searchengine_ray.pipelines.dedup import bucket_pairs_group

    g = pa.table({"doc_id": pa.array(list(range(300)), pa.int64())})
    out = bucket_pairs_group(g, max_bucket=20)
    assert out.num_rows == 20 * 19 // 2
    assert out["trunc"].to_pylist()[0] == 1


def test_minhash_signature_segmented_parity():
    """The whole-batch segmented signature path equals the documented
    single-doc API for every doc."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.pipelines.dedup import (
        _shingle_arrays,
        _signatures_segmented,
        minhash_signature,
    )

    rows = [(0, NEAR_A), (1, NEAR_B), (2, OTHER), (3, "x"), (4, "")]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    doc_ids, sh, seg = _shingle_arrays(t)
    sig = _signatures_segmented(sh, seg)
    for i in range(len(doc_ids)):
        np.testing.assert_array_equal(
            sig[:, i], minhash_signature(sh[seg[i]:seg[i + 1]])
        )


def test_jaccard_verified_pairs(ray_session):
    """Exact-Jaccard verification keeps near-dups (j >= 1/2) and drops
    sub-threshold candidates; intersection/union kept integer-exact."""
    from searchengine_ray.pipelines.dedup import jaccard_verified_pairs

    rows = [(0, NEAR_A), (1, NEAR_B), (2, OTHER), (4, NEAR_A)]
    out = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
           for r in jaccard_verified_pairs(_docs_from(rows)).take_all()}
    assert (0, 4) in out               # exact dup: jaccard 1
    ni, nu = out[(0, 4)]
    assert ni == nu and ni > 0
    for (a, b), (i, u) in out.items():
        assert 2 * i >= u              # the rational threshold held


def test_embedding_near_dup(ray_session):
    """A planted duplicate vector is found with sim_q2 == 100."""
    import numpy as np
    import ray.data

    from searchengine_ray.pipelines.similarity import embedding_near_dup

    rs = np.random.RandomState(5)
    m = rs.randn(60, 16).astype(np.float32)
    m[7] = m[3]  # planted exact duplicate
    t = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
    })
    out = {(r["doc_a"], r["doc_b"]): r["sim_q2"]
           for r in embedding_near_dup(
               ray.data.from_arrow(t), threshold=0.9).take_all()}
    assert out.get((3, 7)) == 100


def test_sliding_window_counts(ray_session):
    import ray.data

    from searchengine_ray.pipelines.events import sliding_window_counts

    # two events 1 hour apart, one 10 hours later
    base = 1_700_000_000_000_000  # µs
    t = pa.table({
        "ts": pa.array([base, base + 3_600_000_000,
                        base + 36_000_000_000], pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "a"], pa.string()),
        "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
    })
    out = {r["hour_bucket"]: (r["n"], r["sum_value_q4"])
           for r in sliding_window_counts(
               ray.data.from_arrow(t), window_hours=2).take_all()}
    h0 = base // 3_600_000_000
    assert out[h0] == (1, 10_000)          # window covers event 1
    assert out[h0 + 1] == (2, 30_000)      # events 1+2
    assert out[h0 + 2] == (1, 20_000)      # event 2 trailing
    assert out[h0 + 10] == (1, 40_000)     # the late event


def test_asof_join_latest(ray_session):
    import ray.data

    from searchengine_ray.pipelines.events import asof_join_latest

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([10 * us, 20 * us, 25 * us, 5 * us, 30 * us,
                        40 * us], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 8, 8, 9], pa.int64()),
        "event_type": pa.array(["view", "view", "click", "click",
                                "click", "click"], pa.string()),
    })
    out = {r["event_id"]: (r["matched_event_id"], r["lag_us"])
           for r in asof_join_latest(ray.data.from_arrow(t)).take_all()}
    assert out[3] == (2, 5 * us)   # click@25 -> view@20
    assert 4 not in out            # click@5 has no prior view (user 8)
    assert 5 not in out            # user 8 has no views at all
    assert 6 not in out            # user 9 has no views


def test_curate_corpus(ray_session, tmp_path):
    """End-to-end curation: integer rules + lang filter + exact dedup +
    language-partitioned parquet output."""
    import os

    from searchengine_ray.pipelines.curate import curate_corpus

    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),  # keep (en)
        (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (2, "x"),                                   # too short
        (3, "12345 67890 11111 22222 33333 9"),     # digit-heavy
        (4, "der hund und die katze sind nicht zu hause heute"),  # keep (de)
        (5, "zz qq ww ee rr tt yy uu ii oo"),       # no marker hits -> und
    ]
    out_dir = str(tmp_path / "curated")
    out = curate_corpus(_docs_from(rows), out_dir=out_dir).take_all()
    got = {r["doc_id"]: r["lang_pred"] for r in out}
    assert got == {0: "en", 4: "de"}   # dup 1 dropped, 2/3/5 filtered
    assert os.path.isdir(os.path.join(out_dir, "lang_pred=en"))
    assert os.path.isdir(os.path.join(out_dir, "lang_pred=de"))


def test_stratified_sample_deterministic(ray_session):
    """The sample is a pure function of (doc_id, lang) — identical
    across runs and partitionings; rates gate per language."""
    import ray.data

    from searchengine_ray.pipelines.curate import stratified_sample

    t = pa.table({
        "doc_id": pa.array(range(1000), pa.int64()),
        "lang": pa.array((["en", "de"] * 500), pa.string()),
    })
    r1 = {r["doc_id"] for r in stratified_sample(
        ray.data.from_arrow(t), {"en": 500, "de": 0}).take_all()}
    r2 = {r["doc_id"] for r in stratified_sample(
        ray.data.from_arrow(t).repartition(7),
        {"en": 500, "de": 0}).take_all()}
    assert r1 == r2                      # partitioning-independent
    assert all(d % 2 == 0 for d in r1)   # de rate 0 -> only en docs
    assert 0.35 < len(r1) / 500 < 0.65   # ~half of the en docs


def test_truncation_skew_keeps_pairs_other_bands_saw(ray_session):
    """Adversarial skew: a pair whose band-0 bucket is over the cap
    must still come out (untruncated) via its band-1 bucket — the
    any-band emission + pair-dedup design cannot lose a pair one band
    truncated while another band kept both members. Pairs from capped
    buckets stay flagged; solid pairs do not."""
    import ray.data

    from searchengine_ray.pipelines.dedup import candidates_from_bands

    # docs 1,2,3 share band-0 bucket 10 (over the cap of 2 -> doc 3
    # truncated there); docs 2,3 also share band-1 bucket 20
    ab = {1: [10, 99], 2: [10, 20], 3: [10, 20]}
    rows = []
    for doc, buckets in ab.items():
        for band, bucket in enumerate(buckets):
            rows.append({"band": band, "bucket": bucket, "doc_id": doc})
    t = pa.table({
        "band": pa.array([r["band"] for r in rows], pa.int32()),
        "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
    })
    bands = ray.data.from_arrow(t)

    got = {(r["doc_a"], r["doc_b"]): r["truncated"]
           for r in candidates_from_bands(bands, max_bucket=2).take_all()}
    # (2,3) recovered via band 1; (1,3) unrecoverable (doc 3 dropped in
    # its only shared bucket) — that loss is the warning-logged cap
    assert set(got) == {(1, 2), (2, 3)}
    assert got[(1, 2)] is True      # only seen in the capped bucket
    assert got[(2, 3)] is False     # solid via band 1's uncapped bucket


def test_curate_overwrite_guard(ray_session, tmp_path):
    """curate_corpus must refuse to replace an existing non-empty
    out_dir without overwrite=True (and honor it when passed)."""
    from searchengine_ray.pipelines.curate import curate_corpus

    rows = [(0, "the quick brown fox jumps over the lazy dog today")]
    out_dir = tmp_path / "curated"
    out_dir.mkdir()
    (out_dir / "precious.txt").write_text("user data")

    with pytest.raises(ValueError, match="overwrite"):
        curate_corpus(_docs_from(rows), out_dir=str(out_dir))
    assert (out_dir / "precious.txt").exists()   # nothing touched

    out = curate_corpus(_docs_from(rows), out_dir=str(out_dir),
                        overwrite=True).take_all()
    assert {r["doc_id"] for r in out} == {0}
    assert not (out_dir / "precious.txt").exists()
    assert os.path.isdir(out_dir / "lang_pred=en")


def test_minhash_empty_and_pairless_corpora(ray_session):
    """The two-shuffle LSH path (sort → block pairs → pair-keyed
    aggregate) must come back typed-empty for corpora with no pairs
    and for fully empty corpora (Ray's empty sort-partition blocks are
    the classic schemaless trap)."""
    import ray.data

    from searchengine_ray.pipelines.dedup import minhash_candidates

    unique_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta",
                          "completely different words here",
                          "third unrelated doc text"], pa.string()),
    }))
    assert minhash_candidates(unique_docs).take_all() == []
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert minhash_candidates(empty).take_all() == []
