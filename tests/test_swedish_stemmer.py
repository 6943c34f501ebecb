"""Snowball Swedish stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Swedish stemming algorithm"
— no stemmer package ships in this container, so each expected value
below was derived by hand-executing the spec's steps and annotating the
rule exercised), plus an end-to-end Swedish index + search round trip
(reference accepts any Snowball language, tokenizer.py:24-33).

Key setlimit semantics under test: a suffix matches only if it lies
entirely within R1, and a SHORTER suffix may match when a longer one
starts before R1 (unlike the German step 1)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import swedish_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1: longest suffix within R1 deleted
    ("jackorna", "jack", "orna in R1 (r1=3)"),
    ("klubbarna", "klubb", "arna in R1; bb not a step-2 pair"),
    ("klokaste", "klok", "aste in R1"),
    ("bilarnas", "bil", "arnas in R1"),
    ("flickor", "flick", "or in R1"),
    ("sista", "sist", "a in R1"),
    ("dagens", "dag", "ens in R1"),
    ("angivandet", "angiv", "andet in R1"),
    ("betalningens", "betalning", "ens in R1; ning is not a suffix"),
    # setlimit fallback: longer suffix starts before R1, shorter matches
    ("handen", "hand", "anden starts before R1; en within R1 matches"),
    ("hennes", "henn", "es within R1; nn pair NOT within R1 in step 2"),
    # step 1(b): s after a valid s-ending
    ("dags", "dag", "s with valid s-ending g"),
    ("radios", "radio", "s with valid s-ending o"),
    ("menus", "menus", "u is not a valid s-ending"),
    ("klias", "klias", "as/s not within R1 (r1 after vowel run ia)"),
    # step 2: consonant pair within R1
    ("friskt", "frisk", "kt within R1"),
    ("högt", "högt", "gt NOT within R1 (word too short)"),
    # step 3
    ("möjlighet", "möj", "het (step 1) then lig (step 3)"),
    ("händelser", "händ", "er (step 1) then els (step 3)"),
    ("hopplöst", "hopplös", "löst → lös in R1"),
    ("löst", "löst", "löst NOT within R1"),
    ("kraftfullt", "kraftfull", "fullt → full in R1"),
    ("fullt", "fullt", "fullt NOT within R1"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_swedish_vocabulary(word, expected, rule):
    assert swedish_stem(word) == expected, rule


def test_swedish_r1_min3():
    from searchengine_ray.text.stemmer import _SV_VOWELS, _scand_r1

    # R1 would start at 2 for 'ovanligt' (o-v…); adjusted to 3
    assert _scand_r1("ovanligt", _SV_VOWELS) == 3
    # no consonant after a vowel → R1 empty (start = len)
    assert _scand_r1("boa", _SV_VOWELS) == 3
    assert _scand_r1("bo", _SV_VOWELS) == 3     # min-3 exceeds length


def test_swedish_index_end_to_end(ray_session, tmp_path):
    """Build a Swedish-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://sv.test/0", "flickorna leker i parken"),
        ("https://sv.test/1", "en flicka springer på gatan"),
        ("https://sv.test/2", "jackorna hänger i hallen"),
        ("https://sv.test/3", "en ny jacka till vintern"),
        ("https://sv.test/4", "tåget avgår från stationen"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="swedish", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "swedish"
    # flickorna / flicka both stem to flick
    res = s.search("flickorna", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://sv.test/0", "https://sv.test/1"} <= urls
    # jackorna / jacka both stem to jack
    res2 = s.search("jacka", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://sv.test/2", "https://sv.test/3"} <= urls2
