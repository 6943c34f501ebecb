"""dedup_against: new docs kept iff unseen in the existing corpus,
deduped within the new batch; old side accepts raw docs OR a
persisted fingerprint table."""

import hashlib

import pyarrow as pa
import pytest


def _docs(rows):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)


OLD = [(100, "seen before"), (101, "also old")]
NEW = [
    (1, "brand new"),
    (2, "seen before"),        # dup of old → dropped
    (3, "brand new"),          # dup within new → doc 1 wins
    (4, "another fresh one"),
    (5, "also old"),           # dup of old → dropped
]
WANT = sorted([
    (hashlib.md5(b"brand new").hexdigest(), 1),
    (hashlib.md5(b"another fresh one").hexdigest(), 4),
])


@pytest.mark.usefixtures("ray_session")
def test_dedup_against_docs():
    from searchengine_ray.pipelines.dedup import dedup_against

    got = sorted((r["fingerprint"], r["doc_id"]) for r in
                 dedup_against(_docs(NEW), _docs(OLD)).take_all())
    assert got == WANT


@pytest.mark.usefixtures("ray_session")
def test_dedup_against_fingerprint_table():
    import ray

    from searchengine_ray.pipelines.dedup import dedup_against

    fps = ray.data.from_arrow(pa.table({
        "fingerprint": pa.array(
            [hashlib.md5(t.encode()).hexdigest() for _, t in OLD],
            pa.string()),
    }))
    got = sorted((r["fingerprint"], r["doc_id"]) for r in
                 dedup_against(_docs(NEW), fps).take_all())
    assert got == WANT


@pytest.mark.usefixtures("ray_session")
def test_dedup_against_empty_old_keeps_all_distinct():
    from searchengine_ray.pipelines.dedup import dedup_against

    got = dedup_against(_docs(NEW), _docs([(9, "unrelated")])).take_all()
    assert sorted(r["doc_id"] for r in got) == [1, 2, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_normalized_dedup_catches_reencodings():
    import ray

    from searchengine_ray.pipelines.dedup import normalized_dedup

    texts = ["Fast Spark merge!", "fast   spark MERGE", "fast spark merge",
             "different doc entirely", "  fast spark, merge.  "]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    out = normalized_dedup(ds).to_pandas()
    groups = {r.doc_id: r.n_dups for r in out.itertuples()}
    # docs 0,1,2,4 normalize identically → one winner (min id 0, ×4)
    assert groups == {0: 4, 3: 1}
