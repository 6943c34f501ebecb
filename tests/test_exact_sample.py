"""exact_sample: exact size, hash-order determinism, partitioning
independence, salt independence."""

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.curate import exact_sample


def _ds(n, parts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
    })).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_exact_size_and_partition_independence():
    a = exact_sample(_ds(500, 1), k=40).to_pylist()
    b = exact_sample(_ds(500, 7), k=40).to_pylist()
    assert len(a) == 40 and a == b
    assert len({r["doc_id"] for r in a}) == 40


@pytest.mark.usefixtures("ray_session")
def test_salt_changes_sample_and_k_overflow():
    base = {r["doc_id"] for r in exact_sample(_ds(500, 4), k=40)
            .to_pylist()}
    other = {r["doc_id"] for r in exact_sample(_ds(500, 4), k=40,
                                               salt="other").to_pylist()}
    assert base != other            # independent draw
    assert len(other) == 40
    allrows = exact_sample(_ds(30, 4), k=100).to_pylist()
    assert sorted(r["doc_id"] for r in allrows) == list(range(30))


def _gds(n, parts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 3 else "de" for i in range(n)],
                         pa.string()),
    })).repartition(parts)


@pytest.mark.usefixtures("ray_session")
def test_group_sample_exact_per_group_and_partition_independent():
    from searchengine_ray.pipelines.curate import group_sample

    a = group_sample(_gds(300, 1), k=10).to_pylist()
    b = group_sample(_gds(300, 7), k=10).to_pylist()
    assert a == b
    from collections import Counter

    c = Counter(r["group"] for r in a)
    assert c == {"en": 10, "de": 10}
    # k larger than a group: the whole group comes back
    small = group_sample(_gds(12, 3), k=10).to_pylist()  # de has 4 docs
    cc = Counter(r["group"] for r in small)
    assert cc["de"] == 4 and cc["en"] == 8


@pytest.mark.usefixtures("ray_session")
def test_split_corpus_stability_and_fractions():
    from searchengine_ray.pipelines.curate import split_corpus

    a = split_corpus(_ds(2000, 1)).to_pandas().sort_values("doc_id")
    b = split_corpus(_ds(2000, 7)).to_pandas().sort_values("doc_id")
    assert a.equals(b.reset_index(drop=True).set_index(a.index))
    frac = a["split"].value_counts(normalize=True)
    assert 0.95 < frac["train"] < 1.0
    assert 0 < frac.get("val", 0) < 0.05 and 0 < frac.get("test", 0) < 0.05
    # growth stability: the first 500 docs keep their assignment when
    # 1500 more arrive
    small = split_corpus(_ds(500, 3)).to_pandas().set_index("doc_id")
    big = a.set_index("doc_id")
    assert (big.loc[small.index, "split"] == small["split"]).all()
    with pytest.raises(ValueError, match="sum to 1000"):
        split_corpus(_ds(10, 1), splits={"a": 500, "b": 499})
