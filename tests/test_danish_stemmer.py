"""Snowball Danish stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Danish stemming algorithm"
— no stemmer package ships in this container, so each expected value
below was derived by hand-executing the spec's steps and annotating the
rule exercised), plus an end-to-end Danish index + search round trip
(reference accepts any Snowball language, tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import danish_stem

# (word, expected, rule exercised)
VOCAB = [
    # the spec's own worked example: e (1) → els (3, + step-2 repeat)
    # → undouble (4)
    ("bestemmelse", "bestem", "e; els; undouble mm"),
    # step 1
    ("hvilket", "hvilk", "et in R1"),
    ("hestens", "hest", "ens in R1"),
    ("studerende", "stud", "erende in R1 (longest)"),
    ("havende", "hav", "erende starts before R1; ende within R1"),
    ("nyhedens", "nyhed", "hedens starts before R1; ens within R1"),
    # step 1(b): s after a valid s-ending
    ("arbejds", "arbejd", "s with valid s-ending d"),
    ("status", "status", "u is not a valid s-ending"),
    # step 2: consonant pair within R1
    ("blandt", "bland", "dt within R1"),
    ("godt", "godt", "dt NOT within R1 (word too short)"),
    # step 3
    ("venligst", "ven", "igst drops st; lig deleted in R1"),
    ("frygtløst", "frygtløs", "løst → løs in R1"),
    ("løst", "løst", "løst NOT within R1"),
    # step 4 undouble
    ("katte", "kat", "e deleted; tt undoubled in R1"),
    ("dannelsen", "dan", "en; els; nn undoubled"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_danish_vocabulary(word, expected, rule):
    assert danish_stem(word) == expected, rule


def test_danish_undouble_requires_r1_and_consonant():
    assert danish_stem("gitte") == "git"   # tt in R1 undoubled
    assert danish_stem("idee") == "ide"    # final ee: vowels never undouble
    # double consonant NOT in R1 (last-letter index 2 < r1 start 3)
    assert danish_stem("egg") == "egg"


def test_danish_index_end_to_end(ray_session, tmp_path):
    """Build a Danish-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://da.test/0", "kattene sover på taget"),
        ("https://da.test/1", "en kat løber gennem gaden"),
        ("https://da.test/2", "bestemmelserne i den nye lov"),
        ("https://da.test/3", "en bestemmelse om arbejdstid"),
        ("https://da.test/4", "toget kører fra stationen"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="danish", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "danish"
    # kattene / kat both stem to kat
    res = s.search("kattene", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://da.test/0", "https://da.test/1"} <= urls
    # bestemmelserne / bestemmelse both stem to bestem
    res2 = s.search("bestemmelse", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://da.test/2", "https://da.test/3"} <= urls2
