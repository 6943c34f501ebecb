"""Snowball Norwegian (Bokmål) stemmer: vocabulary pinned from
hand-traces of the published algorithm (snowballstem.org, "The
Norwegian stemming algorithm" — no stemmer package ships in this
container, so each expected value below was derived by hand-executing
the spec's steps and annotating the rule exercised), plus an end-to-end
Norwegian index + search round trip (reference accepts any Snowball
language, tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import norwegian_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1
    ("huset", "hus", "et in R1"),
    ("elskede", "elsk", "ede in R1"),
    ("gutters", "gutt", "ers in R1"),
    ("mulighetene", "mul", "hetene (step 1) then ig (step 3)"),
    ("sendes", "send", "endes starts before R1; es within R1"),
    ("nyheten", "nyhet", "heten starts before R1; en within R1"),
    # step 1: erte/ert → er
    ("overvurderte", "overvurder", "erte → er in R1"),
    # step 1(b): s-ending rules
    ("verks", "verk", "s after k not preceded by a vowel"),
    ("bøks", "bøks", "k preceded by a vowel → invalid s-ending"),
    ("naboens", "nabo", "ens in R1"),
    # step 2
    ("sendt", "send", "dt within R1"),
    ("blåvt", "blåvt", "vt NOT within R1 (word too short)"),
    # step 3
    ("sikkerhetslov", "sikker", "hetslov in R1 (longest)"),
    ("kjærleg", "kjær", "leg in R1"),
    ("venneleg", "venn", "eleg in R1 beats leg"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_norwegian_vocabulary(word, expected, rule):
    assert norwegian_stem(word) == expected, rule


def test_norwegian_index_end_to_end(ray_session, tmp_path):
    """Build a Norwegian-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://no.test/0", "guttene spiller fotball i parken"),
        ("https://no.test/1", "en gutt løper gjennom gaten"),
        ("https://no.test/2", "mulighetene for ny utvikling"),
        ("https://no.test/3", "en mulighet til å lære"),
        ("https://no.test/4", "toget går fra stasjonen"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="norwegian", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "norwegian"
    # guttene / gutt both stem to gutt
    res = s.search("guttene", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://no.test/0", "https://no.test/1"} <= urls
    # mulighetene / mulighet both stem to mul
    res2 = s.search("mulighet", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://no.test/2", "https://no.test/3"} <= urls2
