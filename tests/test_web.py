"""web.py: canonicalization restores the clean URL for every messy
combo; hand cases for each rule; title extraction."""

import pyarrow as pa
import pytest

from searchengine_ray.pipelines.web import (
    canonical_url_batch,
    extract_title_batch,
)


def test_each_rule_and_combos():
    cases = {
        "https://a.example/x#frag": "https://a.example/x",
        "https://a.example/x?utm_source=s": "https://a.example/x",
        "https://a.example/x?utm_source=s&q=1": "https://a.example/x?q=1",
        "https://a.example/x?q=1&utm_medium=m": "https://a.example/x?q=1",
        "https://a.example:443/x": "https://a.example/x",
        "http://a.example:80/x": "http://a.example/x",
        "https://www.a.example/x": "https://a.example/x",
        "https://a.example/x/": "https://a.example/x",
        "https://a.example/": "https://a.example/",      # root slash kept
        "HTTPS://WWW.A.EXAMPLE:443/Path?utm_source=s#f":
            "https://a.example/Path",                     # path case kept
        "not a url": "not a url",                         # pass-through
    }
    t = pa.table({"url": pa.array(list(cases), pa.string())})
    got = canonical_url_batch(t)["canonical_url"].to_pylist()
    assert got == list(cases.values())


def test_messy_synthesis_roundtrip():
    # every doc_id-mod combination must canonicalize back to its base
    bases, messy = [], []
    for d in range(0, 420):
        u = base = f"https://src.example.test/doc/{d:010d}"
        if d % 2 == 1:
            u += "?utm_source=news&utm_medium=mail"
        if d % 3 == 0:
            u = "HTTPS://WWW." + u[len("https://"):]
        if d % 5 == 0:
            u = u.replace(".example.test/", ".example.test:443/", 1)
        if d % 7 == 0:
            u += "/"
        bases.append(base)
        messy.append(u)
    t = pa.table({"url": pa.array(messy, pa.string())})
    got = canonical_url_batch(t)["canonical_url"].to_pylist()
    assert got == bases


def test_extract_title():
    t = pa.table({
        "html": pa.array([b"<html><head><title>Hello World</title>"
                          b"</head><body>x</body></html>",
                          b"<html><body>no title</body></html>",
                          b""], pa.binary()),
    })
    out = extract_title_batch(t)
    assert out["title"].to_pylist() == ["Hello World", "", ""]
    assert out["title_chars"].to_pylist() == [11, 0, 0]
    assert "html" not in out.column_names


@pytest.mark.usefixtures("ray_session")
def test_url_dedup_collapses_variants():
    import ray

    from searchengine_ray.pipelines.web import url_dedup

    urls = ["https://a.example/x", "HTTPS://WWW.A.EXAMPLE/x",
            "https://a.example/x?utm_source=s", "https://b.example/y/",
            "https://b.example/y"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(2)
    got = sorted(url_dedup(ds).to_pandas().itertuples(index=False))
    assert [(r.canonical_url, r.doc_id, r.n_dups) for r in got] == [
        ("https://a.example/x", 0, 3), ("https://b.example/y", 3, 2)]


@pytest.mark.usefixtures("ray_session")
def test_host_stats_and_blocklist():
    import ray

    from searchengine_ray.pipelines.web import (
        host_stats,
        url_blocklist_filter,
    )

    tbl = pa.table({
        "url": pa.array(["https://a.ex/1", "HTTPS://A.EX/2",
                         "https://b.ex/ads/3", "https://b.ex/4"],
                        pa.string()),
        "html": pa.array([b"xx", b"yyyy", b"z", b"ww"], pa.binary()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    hs = {r["host"]: (r["n_docs"], r["total_bytes"])
          for r in host_stats(ds).to_pandas().to_dict("records")}
    assert hs == {"a.ex": (2, 6), "b.ex": (2, 3)}
    kept = url_blocklist_filter(ds, [r"/ads/", r"^https://a\."]) \
        .to_pandas()["url"].tolist()
    assert kept == ["HTTPS://A.EX/2", "https://b.ex/4"]
