"""Round-3 operators: exact phrase search over the positional index,
per-host cap sampling, PII redaction, and per-doc repetition stats.
The sf0.01 contract oracles pin bulk behavior; these tests pin the
edge semantics (overlapping matches, repeated tokens, tie order,
error paths) on hand-built corpora."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _build(tmp_path, texts, positional=True, **cfg_kw):
    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig, PostingType

    tbl = pa.table({
        "url": pa.array([f"https://t/{i}" for i in range(len(texts))],
                        pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(
        posting_type=(PostingType.POSITIONAL if positional
                      else PostingType.FREQUENCY),
        num_shards=2, use_stop_words=False, min_token_length=2,
        **cfg_kw,
    ))
    return idx


def test_phrase_basic_and_order(ray_session, tmp_path):
    from searchengine_ray.query.engine import Searcher

    idx = _build(tmp_path, [
        "alpha beta gamma",              # doc 0: 1 match
        "alpha beta alpha beta gamma",   # doc 1: 2 matches
        "beta alpha",                    # doc 2: wrong order
        "alpha delta beta",              # doc 3: not consecutive
    ])
    s = Searcher(idx)
    t = s.search_phrase("alpha beta", 10)
    assert t["doc_id"].to_pylist() == [1, 0]       # most matches first
    assert t["n_matches"].to_pylist() == [2, 1]
    assert t["rank"].to_pylist() == [1, 2]


def test_phrase_overlapping_repeated_token(ray_session, tmp_path):
    """'aa aa' in 'aa aa aa' matches at positions 0 and 1 (overlap
    counts, matching the SQL oracle's every-starting-position rule)."""
    from searchengine_ray.query.engine import Searcher

    idx = _build(tmp_path, [
        "aa aa aa",        # doc 0: 2 overlapping matches
        "aa bb aa",        # doc 1: none
        "aa aa",           # doc 2: 1
    ])
    s = Searcher(idx)
    t = s.search_phrase("aa aa", 10)
    assert t["doc_id"].to_pylist() == [0, 2]
    assert t["n_matches"].to_pylist() == [2, 1]


def test_phrase_three_terms_and_stopword_positions(ray_session, tmp_path):
    """Positions index the FILTERED token sequence: min_token_length
    drops 1-char tokens, so 'alpha x beta' still matches the phrase
    'alpha beta' (same rule as the SQL oracle's filtered list)."""
    from searchengine_ray.query.engine import Searcher

    idx = _build(tmp_path, [
        "alpha x beta gamma",     # 'x' filtered -> alpha beta adjacent
        "alpha xx beta gamma",    # 'xx' kept -> not adjacent
    ])
    s = Searcher(idx)
    t = s.search_phrase("alpha beta gamma", 10)
    assert t["doc_id"].to_pylist() == [0]
    t2 = s.search_phrase("alpha beta", 10)
    assert t2["doc_id"].to_pylist() == [0]


def test_phrase_missing_term_and_single_token(ray_session, tmp_path):
    from searchengine_ray.query.engine import Searcher

    idx = _build(tmp_path, ["alpha beta", "beta beta beta"])
    s = Searcher(idx)
    assert s.search_phrase("alpha zzzz", 10).num_rows == 0
    # single token: rank by tf
    t = s.search_phrase("beta", 10)
    assert t["doc_id"].to_pylist() == [1, 0]
    assert t["n_matches"].to_pylist() == [3, 1]


def test_phrase_requires_positional_index(ray_session, tmp_path):
    from searchengine_ray.query.engine import Searcher

    idx = _build(tmp_path, ["alpha beta"], positional=False)
    s = Searcher(idx)
    with pytest.raises(ValueError, match="positional"):
        s.search_phrase("alpha beta", 10)


def test_host_cap_sample(ray_session):
    import ray.data

    from searchengine_ray.pipelines.curate import host_cap_sample

    tbl = pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "source": pa.array(["a"] * 7 + ["b"] * 3, pa.string()),
    })
    out = host_cap_sample(ray.data.from_arrow(tbl), cap=3).to_pandas()
    by_host = out.groupby("source")["doc_id"].apply(sorted).to_dict()
    assert by_host == {"a": [0, 1, 2], "b": [7, 8, 9]}


def test_host_cap_combiner_bounds_shuffle_volume(ray_session):
    """The pre-shuffle combiner ships <= cap rows per (host, batch) into
    the groupby, and the combined result is exact regardless of how
    rows are partitioned across batches."""
    import ray.data

    from searchengine_ray.pipelines.curate import (
        _cap_lowest_per_host,
        host_cap_sample,
    )

    rs = np.random.RandomState(3)
    n = 600
    ids = rs.permutation(n).astype(np.int64)
    hosts = np.array(["h%d" % (i % 4) for i in range(n)], object)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(hosts, pa.string()),
        "pad": pa.array(["x" * 50] * n, pa.string()),
    })
    # shuffle-volume bound: the combiner output of ONE batch is
    # <= cap x distinct hosts, whatever the batch holds
    capped = _cap_lowest_per_host(tbl, 5, "source")
    assert capped.num_rows == 5 * 4
    # exactness across an adversarial partitioning (12 small blocks,
    # each seeing every host)
    ds = ray.data.from_arrow(tbl).repartition(12)
    out = host_cap_sample(ds, cap=5).to_pandas()
    df = tbl.to_pandas()[["doc_id", "source"]]
    exp = df.sort_values("doc_id").groupby("source").head(5)
    got = {(r.source, r.doc_id) for r in out.itertuples()}
    want = {(r.source, r.doc_id) for r in exp.itertuples()}
    assert got == want


def test_pii_redact_batch():
    from searchengine_ray.pipelines.analysis import pii_redact_batch

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "mail a.b+c@x-site.org or x@y.io call 555-1234",
            "no pii here",
            "dots 123.4567 and dash 000-0000",
        ], pa.string()),
    })
    out = pii_redact_batch(batch)
    assert out["n_emails"].to_pylist() == [2, 0, 0]
    assert out["n_phones"].to_pylist() == [1, 0, 2]
    # fingerprints are md5 of the redacted text (stable)
    import hashlib
    exp = hashlib.md5(
        "mail <EMAIL> or <EMAIL> call <PHONE>".encode()).hexdigest()
    assert out["redacted_fp"].to_pylist()[0] == exp


def test_decontaminate(ray_session):
    """Docs sharing any probe trigram are flagged; occurrence counts
    include repeats; probe docs self-match."""
    import ray.data

    from searchengine_ray.pipelines.decontam import decontaminate

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps",        # probe doc
            "lazy the quick brown dog",         # shares "the quick brown"
            "quick brown fox here and quick brown fox there",  # 2 hits
            "totally different words entirely",
        ], pa.string()),
    })
    docs_ds = ray.data.from_arrow(docs)
    probe_ds = ray.data.from_arrow(docs.slice(0, 1))
    out = decontaminate(docs_ds, probe_ds, n=3, concurrency=2).to_pandas()
    got = out.set_index("doc_id").sort_index()
    assert got["n_hits"].tolist() == [3, 1, 2, 0]
    assert got["contaminated"].tolist() == [1, 1, 1, 0]


def test_keywords_topk(ray_session):
    """Rarer terms outrank common ones at equal tf; ties break
    term-ascending; rank within doc is dense from 1."""
    import ray.data

    from searchengine_ray.pipelines.analysis import keywords_topk

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "common rare common",     # rare (df=1) beats common (df=4)
            "common zebra",           # zebra df=1
            "common apple banana",    # equal-score tie → term asc
            "common",
        ], pa.string()),
    })
    out = keywords_topk(ray.data.from_arrow(docs), k=2,
                        concurrency=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    assert d0["term"].tolist() == ["rare", "common"]
    d2 = out[out.doc_id == 2].sort_values("rank")
    assert d2["term"].tolist() == ["apple", "banana"]   # tie → term asc
    assert (out.groupby("doc_id")["rank"].min() == 1).all()
    assert (out.groupby("doc_id")["rank"].max() <= 2).all()


def test_chunk_documents_batch():
    """Stride windows: starts at 0, S, 2S while < n_tokens; last chunk
    truncated; empty docs produce no chunks; fingerprints pin content."""
    import hashlib

    from searchengine_ray.pipelines.curate import chunk_documents_batch

    toks = [f"tok{i:02d}" for i in range(10)]
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([" ".join(toks), "aa bb", ""], pa.string()),
    })
    out = chunk_documents_batch(batch, chunk_tokens=4, stride=3)
    rows = sorted(out.to_pylist(), key=lambda r: (r["doc_id"],
                                                  r["chunk_seq"]))
    d0 = [r for r in rows if r["doc_id"] == 0]
    # starts 0,3,6,9 → lengths 4,4,4,1
    assert [r["n_tokens"] for r in d0] == [4, 4, 4, 1]
    assert d0[0]["chunk_fp"] == hashlib.md5(
        " ".join(toks[0:4]).encode()).hexdigest()
    assert d0[1]["chunk_fp"] == hashlib.md5(
        " ".join(toks[3:7]).encode()).hexdigest()
    assert d0[3]["chunk_fp"] == hashlib.md5(toks[9].encode()).hexdigest()
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert len(d1) == 1 and d1[0]["n_tokens"] == 2
    assert not [r for r in rows if r["doc_id"] == 2]


def test_sessionize(ray_session):
    """Sessions break on gaps > gap_us per user; session_id is the
    first event's id; seq is 1-based within session."""
    import ray.data

    from searchengine_ray.pipelines.events import sessionize

    us = 1_000_000
    ev = pa.table({
        "event_id": pa.array([10, 11, 12, 20, 21], pa.int64()),
        "ts": pa.array([0, 5 * us, 100 * us, 3 * us, 200 * us],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
    })
    out = sessionize(ray.data.from_arrow(ev), gap_us=30 * us).to_pandas()
    got = out.set_index("event_id").sort_index()
    # user 1: events at 0s,5s (one session), 100s (new session)
    assert got.loc[10, "session_id"] == 10 and got.loc[10, "session_seq"] == 1
    assert got.loc[11, "session_id"] == 10 and got.loc[11, "session_seq"] == 2
    assert got.loc[12, "session_id"] == 12 and got.loc[12, "session_seq"] == 1
    # user 2: 3s and 200s → two sessions
    assert got.loc[20, "session_id"] == 20
    assert got.loc[21, "session_id"] == 21


def test_repetition_stats_batch():
    from searchengine_ray.pipelines.analysis import repetition_stats_batch

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "go go go go",        # bigrams: 3x "go go"; trigrams 2x dup
            "aa bb cc dd",        # all unique
            "",                   # empty
        ], pa.string()),
    })
    out = repetition_stats_batch(batch)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["top_bigram_count"] == 3
    assert rows[0]["n_trigrams"] == 2
    assert rows[0]["dup_trigram_occurrences"] == 2
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["top_bigram_count"] == 1
    assert rows[1]["dup_trigram_occurrences"] == 0
    assert rows[2]["n_bigrams"] == 0
    assert rows[2]["n_trigrams"] == 0


def test_cli_curate_ops(ray_session, tmp_path, capsys):
    """The curate CLI runs each op end-to-end and writes parquet."""
    import json

    from searchengine_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta",
            "alpha beta alpha beta",
            "totally different words",
        ], pa.string()),
        "source": pa.array(["a.com", "a.com", "b.org"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)

    for op, extra in (
        ("chunk", ["--chunk-tokens", "3", "--stride", "2"]),
        ("decontam", ["--probe", src, "--ngram", "2"]),
        ("keywords", ["--k", "2"]),
        ("pii", []),
        ("repetition", []),
        ("resample", ["--group-column", "source", "--alpha", "0.5"]),
        ("pack", ["--capacity", "5", "--num-parts", "2"]),
        ("spandedup", ["--span-tokens", "2"]),
    ):
        out_dir = str(tmp_path / f"out_{op}")
        rc = main(["curate", "--op", op, "--documents", src,
                   "--output", out_dir] + extra)
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["rows"] > 0, op

    # hostcap on the source column
    rc = main(["curate", "--op", "hostcap", "--documents", src,
               "--output", str(tmp_path / "out_hostcap"), "--cap", "1",
               "--host-column", "source"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 2    # one per host

    ev = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([0, 10_000_000_000], pa.timestamp("us")),
        "user_id": pa.array([7, 7], pa.int64()),
    })
    evp = str(tmp_path / "events.parquet")
    pq.write_table(ev, evp)
    rc = main(["curate", "--op", "sessionize", "--documents", evp,
               "--output", str(tmp_path / "out_sess")])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 2


def test_cli_curate_refuses_nonempty_output(ray_session, tmp_path, capsys):
    """Rerunning into a non-empty output dir refuses without
    --overwrite (a rerun would append duplicate parquet files)."""
    import json

    from searchengine_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha beta gamma"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out_dir = str(tmp_path / "out")
    assert main(["curate", "--op", "repetition", "--documents", src,
                 "--output", out_dir]) == 0
    capsys.readouterr()
    with pytest.raises(SystemExit, match="overwrite"):
        main(["curate", "--op", "repetition", "--documents", src,
              "--output", out_dir])
    assert main(["curate", "--op", "repetition", "--documents", src,
                 "--output", out_dir, "--overwrite"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 1     # no duplicate append


def test_bigram_lm_score(ray_session):
    """Add-k bigram LM: hand-computed quantized log-probs on a tiny
    corpus; repeated bigrams score higher (less negative) than unique
    ones; cross-corpus scoring uses the training corpus's counts."""
    import math

    import ray.data

    from searchengine_ray.pipelines.lm import QUANT, bigram_lm_score

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa bb aa bb", "aa cc"], pa.string()),
    })
    ds = ray.data.from_arrow(docs)
    out = bigram_lm_score(ds, add_k=0.5).to_pandas() \
        .set_index("doc_id").sort_index()
    # corpus: tokens aa bb aa bb aa cc -> uni: aa=3 bb=2 cc=1, V=3
    # bigrams: "aa bb"=2, "bb aa"=1, "aa cc"=1
    k, v = 0.5, 3

    def lp(cb, cu):
        return int(np.round(math.log((cb + k) / (cu + k * v)) * QUANT))

    d0 = lp(2, 3) + lp(1, 2) + lp(2, 3)     # aa-bb, bb-aa, aa-bb
    d1 = lp(1, 3)                           # aa-cc
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "logprob_q6"] == d0
    assert out.loc[1, "logprob_q6"] == d1
    # per-bigram: the frequent "aa bb" outscores the rare "aa cc"
    assert lp(2, 3) > lp(1, 3)

    # cross-corpus: train on docs, score an unseen doc -> unseen
    # bigram/unigram fall back to the smoothed floor (counts 0)
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["zz qq"], pa.string()),
    }))
    out2 = bigram_lm_score(new, train_ds=ds, add_k=0.5).to_pandas()
    assert out2.loc[0, "logprob_q6"] == lp(0, 0)


def test_cli_curate_lm(ray_session, tmp_path, capsys):
    import json

    from searchengine_ray.cli import main

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aa bb aa bb", "aa cc"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    rc = main(["curate", "--op", "lm", "--documents", src,
               "--output", str(tmp_path / "out_lm")])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 2


def test_zero_candidate_pairs_keep_schema(ray_session):
    """ADVICE r03: a corpus with no candidate pairs must yield typed
    empty results (the join path would otherwise see schemaless empty
    blocks and fail on the key fields)."""
    import ray.data

    from searchengine_ray.pipelines.dedup import jaccard_verified_pairs
    from searchengine_ray.pipelines.similarity import embedding_near_dup

    rs = np.random.RandomState(0)
    texts = [" ".join(f"w{rs.randint(10**9)}x{i}t{j}" for j in range(12))
             for i in range(40)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    jds = jaccard_verified_pairs(ray.data.from_arrow(docs))
    assert jds.schema().names == ["doc_a", "doc_b", "n_inter", "n_union"]
    assert jds.take_all() == []
    assert len(jds.to_pandas()) == 0  # must not raise (Ray drops
    # columns on ANY empty to_pandas — schema lives on the dataset)

    emb = rs.randn(40, 16).astype(np.float32)
    et = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    })
    eds = embedding_near_dup(ray.data.from_arrow(et), threshold=1.01)
    assert eds.schema().names == ["doc_a", "doc_b", "sim_q2"]
    assert eds.take_all() == []
    assert len(eds.to_pandas()) == 0


# -- round-4: domain temperature resampling --------------------------------

def test_domain_resample(ray_session):
    """Invariants: the smallest domain survives (q=1 → ~every hash
    passes), the head domain is downsampled, output ⊆ input, the gate
    is deterministic across re-runs and partitionings, and alpha=0
    keeps everything."""
    import ray.data

    from searchengine_ray.pipelines.curate import domain_resample

    n_a, n_b = 400, 25
    tbl = pa.table({
        "doc_id": pa.array(list(range(n_a + n_b)), pa.int64()),
        "source": pa.array(["big"] * n_a + ["small"] * n_b, pa.string()),
    })

    out = domain_resample(ray.data.from_arrow(tbl), alpha=0.5).to_pandas()
    by = out.groupby("source")["doc_id"].apply(sorted).to_dict()
    assert by["small"] == list(range(n_a, n_a + n_b))   # q=1: all kept
    # q_big = sqrt(25/400) = 0.25; FNV gate keeps ~100 of 400
    assert 50 < len(by["big"]) < 150
    assert set(by["big"]) <= set(range(n_a))

    # deterministic under a different partitioning
    out2 = domain_resample(
        ray.data.from_arrow(tbl).repartition(7), alpha=0.5
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])

    # alpha=0 → q=1 everywhere → identity
    all_kept = domain_resample(ray.data.from_arrow(tbl), alpha=0.0)
    assert all_kept.count() == n_a + n_b


def test_domain_resample_empty(ray_session):
    import ray.data

    from searchengine_ray.pipelines.curate import domain_resample

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string())})
    out = domain_resample(ray.data.from_arrow(empty))
    assert out.count() == 0
    # (to_pandas() on a 0-row Dataset drops columns — a Ray quirk —
    # so assert the typed schema on the Dataset itself)
    assert sorted(out.schema().names) == ["doc_id", "source"]


# -- round-4: greedy sequence packing --------------------------------------

def test_sequence_pack(ray_session):
    """Invariants: every doc packed exactly once; per-pack pre-token
    sum <= capacity unless the pack is an oversize singleton; pack_seq
    is 1..len in doc_id order; pack ids are dense from 0 per part;
    result is independent of input partitioning."""
    import ray.data

    from searchengine_ray.pipelines.curate import sequence_pack

    texts = {
        0: "a b c",                       # 3 pretokens
        1: "d e",                         # 2
        2: "x " * 10,                     # 10 > capacity → singleton
        3: "f g h i",                     # 4
        4: "j",                           # 1
        5: "k l m n o p",                 # 6
        6: "q r",                         # 2
        7: "s t u",                       # 3
    }
    tbl = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
    })
    cap = 6
    out = sequence_pack(ray.data.from_arrow(tbl), capacity=cap,
                        num_parts=2).to_pandas()
    assert sorted(out["doc_id"]) == sorted(texts)
    for (part, pack), g in out.groupby(["part", "pack_id"]):
        g = g.sort_values("doc_id")
        assert list(g["pack_seq"]) == list(range(1, len(g) + 1))
        assert g["n_pretokens"].sum() <= cap or len(g) == 1
        assert (g["doc_id"] % 2 == part).all()
    for part, g in out.groupby("part"):
        assert sorted(g["pack_id"].unique()) == \
            list(range(g["pack_id"].max() + 1))
        # greedy: doc order within a part maps monotonically to packs
        g = g.sort_values("doc_id")
        assert (g["pack_id"].diff().fillna(0) >= 0).all()
    # doc 2 (10 pretokens > cap) packs alone
    row2 = out[out["doc_id"] == 2].iloc[0]
    mates = out[(out["part"] == row2["part"])
                & (out["pack_id"] == row2["pack_id"])]
    assert len(mates) == 1

    out2 = sequence_pack(ray.data.from_arrow(tbl).repartition(5),
                         capacity=cap, num_parts=2).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


# -- round-4: exact span (tile) dedup --------------------------------------

def test_span_dedup(ray_session):
    """Hand corpus: the first (doc_id, span_no) occurrence of each tile
    survives, later occurrences are removed, docs reassemble from kept
    tiles in order, and a doc whose every tile loses disappears."""
    import ray.data

    from searchengine_ray.pipelines.curate import span_dedup

    rows = [
        (0, "a b c d e f"),           # tiles: 'a b', 'c d', 'e f'
        (1, "c d x y a b"),           # 'c d' and 'a b' lose to doc 0
        (2, "a b c d"),               # both tiles lose → doc vanishes
        (3, "p q"),                   # unique tile survives
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    out = span_dedup(ray.data.from_arrow(tbl), span_tokens=2).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {0: "a b c d e f", 1: "x y", 3: "p q"}
    kept = dict(zip(out["doc_id"], out["n_spans_kept"]))
    assert kept == {0: 3, 1: 1, 3: 1}

    # partitioning independence
    out2 = span_dedup(ray.data.from_arrow(tbl).repartition(3),
                      span_tokens=2).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_span_dedup_partial_tail_and_whitespace(ray_session):
    """A trailing partial tile dedups like any other; repeated
    whitespace collapses identically on both sides (DuckDB oracle uses
    the same non-empty-token rule)."""
    import ray.data

    from searchengine_ray.pipelines.curate import span_dedup

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b  c", "x  y c"], pa.string()),
    })
    # K=2: doc0 tiles 'a b', 'c'; doc1 tiles 'x y', 'c' (loses)
    out = span_dedup(ray.data.from_arrow(tbl), span_tokens=2).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {0: "a b c", 1: "x y"}
