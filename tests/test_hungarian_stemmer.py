"""Snowball Hungarian stemmer: vocabulary pinned from hand-traces of
the published algorithm (snowballstem.org, "The Hungarian stemming
algorithm" — no stemmer package ships in this container, so each
expected value below was derived by hand-executing the spec's steps and
annotating the rule exercised), plus an end-to-end Hungarian index +
search round trip (reference accepts any Snowball language,
tokenizer.py:24-33).

Semantics under test: R1 skips a leading DIGRAPH when the word begins
with a vowel; the instrumental (al/el) and factive (á/é) suffixes
require — and then undouble — a doubled consonant or doubled digraph;
the nine passes each run once, in order, longest-match-then-R1-test
(so the frequent-case 'ul'/'ül' legitimately shadows the later
stul-family, and the owner suffix 'a' re-strips the vowel the case
step's á→a normalisation restored)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import hungarian_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1: instrumental with undoubling
    ("asszonnyal", "asszony", "al after doubled digraph nny → ny"),
    ("tollal", "tol", "al after doubled ll → l"),
    ("autóval", "autó", "óv is not a double: instrumental fails, the "
     "frequent case 'val' deletes instead"),
    # step 2: frequent cases + final á/é normalisation
    ("házban", "ház", "ban in R1"),
    ("házakban", "ház", "ban, then plural ak"),
    ("házat", "ház", "at in R1"),
    ("fát", "fa", "t deleted, final á → a"),
    ("utcán", "utc", "n deleted, á → a restored, then owner 'a' "
     "re-strips it — conflates with bare 'utca'"),
    ("utca", "utc", "owner suffix a in R1"),
    ("szobában", "szob", "ban, á → a, owner a"),
    ("gyerekeknek", "gyerek", "nek, then plural ek"),
    ("forintonként", "forint", "onként in R1 (longest case match)"),
    ("magyarul", "magyar", "ul in R1"),
    ("házastul", "házast", "case 'ul' shadows the later astul pass "
     "(longest match is per step, steps run once in order)"),
    ("fástul", "fást", "same shadowing on the á-variant"),
    # step 5: factive with undoubling
    ("várossá", "város", "á after doubled ss → s"),
    # step 6: owned
    ("házaké", "ház", "aké deleted in R1"),
    # step 7: singular owner (á-variants restore the short vowel)
    ("ruhám", "ruha", "ám → a in R1"),
    ("háza", "ház", "owner a deleted"),
    ("fája", "fá", "owner ja deleted; the bare á entry cannot also "
     "fire (one pass)"),
    ("anyám", "anya", "digraph ny: R1 = 3; ám → a fires exactly at R1"),
    ("anya", "any", "owner a at the R1 boundary"),
    # step 8: plural owner
    ("barátaim", "barát", "owner m (step 7), then plural-owner ai"),
    ("ruháim", "ruha", "owner m, then plural-owner ái → a"),
    # step 9: plural
    ("könyvek", "könyv", "plural ek"),
    ("könyveket", "könyv", "case et, then plural ek"),
    ("kutyák", "kutya", "plural ák → a (last step: the a survives)"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_hungarian_vocabulary(word, expected, rule):
    assert hungarian_stem(word) == expected, rule


def test_hungarian_r1_digraphs():
    from searchengine_ray.text.stemmer import _hu_r1

    # vowel-initial: R1 after the first consonant…
    assert _hu_r1("utca") == 2
    # …or after the whole digraph
    assert _hu_r1("anya") == 3
    assert _hu_r1("edzés") == 3
    # consonant-initial (even a digraph): after the first vowel
    assert _hu_r1("szoba") == 3
    assert _hu_r1("ház") == 2


def test_hungarian_undouble():
    from searchengine_ray.text.stemmer import _hu_ends_double, _hu_undouble

    assert _hu_ends_double("asszonny")
    assert _hu_undouble("asszonny") == "asszony"
    assert _hu_ends_double("toll")
    assert _hu_undouble("toll") == "tol"
    assert not _hu_ends_double("autóv")
    # aa is a vowel pair, not a double consonant
    assert not _hu_ends_double("faa")


def test_hungarian_index_end_to_end(ray_session, tmp_path):
    """Build a Hungarian-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://hu.test/0", "a házban lakik a család"),
        ("https://hu.test/1", "két ház áll az utcában"),
        ("https://hu.test/2", "könyvek vannak a polcon"),
        ("https://hu.test/3", "egy könyv fekszik az asztalon"),
        ("https://hu.test/4", "a vonat elindul az állomásról"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="hungarian", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "hungarian"
    # házban / ház conflate to ház
    res = s.search("házakban", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://hu.test/0", "https://hu.test/1"} <= urls
    # könyvek / könyv conflate to könyv
    res2 = s.search("könyveket", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://hu.test/2", "https://hu.test/3"} <= urls2
