"""Property tests (hypothesis): the vectorized round-3 batch operators
agree with naive pure-Python references on arbitrary inputs."""

import hashlib
import re
from collections import Counter

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "longword", "x"]),
    min_size=0, max_size=30,
)
TEXTS = st.lists(
    TOKENS.map(" ".join), min_size=1, max_size=8,
)


def _simple_toks(text: str) -> list[str]:
    toks = re.sub(r"[^\w\s]", " ", text).lower().split()
    return [t for t in toks if len(t) >= 2]


@given(TEXTS, st.integers(2, 6), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_chunking_matches_naive(texts, k, s):
    from searchengine_ray.pipelines.curate import chunk_documents_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = sorted(chunk_documents_batch(batch, k, s).to_pylist(),
                 key=lambda r: (r["doc_id"], r["chunk_seq"]))
    want = []
    for d, text in enumerate(texts):
        toks = _simple_toks(text)
        start = 0
        seq = 0
        while start < len(toks):
            win = toks[start:start + k]
            want.append({
                "doc_id": d, "chunk_seq": seq,
                "n_tokens": len(win),
                "chunk_fp": hashlib.md5(" ".join(win).encode()).hexdigest(),
            })
            start += s
            seq += 1
    assert got == want


@given(TEXTS)
@settings(max_examples=60, deadline=None)
def test_repetition_stats_match_naive(texts):
    from searchengine_ray.pipelines.analysis import repetition_stats_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = {r["doc_id"]: r for r in repetition_stats_batch(batch).to_pylist()}
    for d, text in enumerate(texts):
        toks = _simple_toks(text)
        bi = Counter(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
        tri = Counter(" ".join(toks[i:i + 3]) for i in range(len(toks) - 2))
        assert got[d]["n_bigrams"] == sum(bi.values())
        assert got[d]["top_bigram_count"] == (max(bi.values()) if bi else 0)
        assert got[d]["n_trigrams"] == sum(tri.values())
        assert got[d]["dup_trigram_occurrences"] == sum(
            c for c in tri.values() if c > 1)


PII_TEXTS = st.lists(
    st.sampled_from([
        "plain text here",
        "mail bob@x.org now",
        "a.b+c@sub.domain.io and 555-0000",
        "digits 123.4567 mixed 99-1234 000.0000",
        "double x@y.co z@w.net",
        "",
    ]),
    min_size=1, max_size=6,
)


@given(PII_TEXTS)
@settings(max_examples=40, deadline=None)
def test_pii_redact_matches_python_re(texts):
    from searchengine_ray.pipelines.analysis import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
        pii_redact_batch,
    )

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = pii_redact_batch(batch).to_pylist()
    for row, text in zip(got, texts):
        n_em = len(re.findall(PII_EMAIL_RE, text))
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", text)
        n_ph = len(re.findall(PII_PHONE_RE, red))
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        assert row["n_emails"] == n_em
        assert row["n_phones"] == n_ph
        assert row["redacted_fp"] == hashlib.md5(red.encode()).hexdigest()
