"""Snowball Romanian stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Romanian stemming algorithm"
— no stemmer package ships in this container, so each expected value
below was derived by hand-executing the spec's steps and annotating the
rule exercised), plus an end-to-end Romanian index + search round trip
(reference accepts any Snowball language, tokenizer.py:24-33).

Semantics under test: step 0/1/2 are longest-match-then-region-test
(no fallback to a shorter suffix), while the verb step runs INSIDE the
RV limit (a longer suffix crossing the RV boundary is invisible and the
preceded-by-consonant-or-u test must also stay within RV), and runs only
when steps 1-2 removed nothing."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import romanian_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 0: plural removal in R1
    ("copiilor", "cop", "iilor → i in R1, then final-vowel i"),
    ("copilului", "copil", "ului deleted in R1"),
    ("cartea", "cart", "ea → e in R1, then final-vowel e"),
    ("familiei", "famil", "iei → i in R1, then final-vowel i"),
    ("acţiunile", "acţiun", "ile → i (not preceded by ab)"),
    ("stabile", "stabil", "ile blocked by the ab guard; final vowel only"),
    ("frumoasele", "frumoas", "ele → e; verb step's longest visible "
     "match is pluperfect 'ase' (conditional), preceded by the vowel o "
     "→ the whole step fails with NO backtrack to the shorter "
     "unconditional 'se'; final e drops"),
    # step 1: combining suffixes in R1 (repeat), gates the verb step
    ("durabilitate", "durabil", "abilitate → abil in R1; abil outside R2 "
     "stays"),
    ("activitatea", "activ", "step 0 ea → e, then ivitate → iv in R1"),
    ("abilitate", "abil", "whole-word suffix outside R1; itate in R2"),
    # step 2: standard suffixes in R2
    ("constituţiune", "constitut", "iune preceded by ţ → ţ replaced by t"),
    ("jurnalism", "jurnalist", "ism → ist in R2"),
    ("jurnalişti", "jurnalist", "işti → ist in R2"),
    ("jurnalist", "jurnalist", "ist → ist (identity, still sets the flag)"),
    ("acţiune", "acţiun", "iune NOT in R2 (short word); final vowel only"),
    ("frumoasă", "frumoas", "oasă NOT in R2; final-vowel ă"),
    # step 3: verb suffixes within the RV limit
    ("lucrează", "lucr", "ează preceded by consonant r in RV"),
    ("lucrez", "lucr", "ez preceded by consonant in RV"),
    ("lucraţi", "lucr", "aţi unconditional in RV"),
    ("mergeam", "merg", "imperfect eam preceded by consonant"),
    ("mersesem", "mer", "pluperfect sesem (unconditional) overlaps the "
     "stem's s — authentic overstemming"),
    ("românesc", "român", "esc preceded by consonant"),
    ("românească", "român", "ească preceded by consonant"),
    ("continuare", "continu", "are preceded by u (the or-u condition)"),
    ("lucrând", "lucr", "ând preceded by consonant within RV"),
    ("făcând", "făcând", "ând starts AT rv: preceding char is outside "
     "the RV limit, condition fails, nothing removed"),
    ("mare", "mar", "are crosses the RV boundary — invisible under the "
     "limit; final-vowel e"),
    ("educaţia", "educ", "step 0 aţia → aţi, then verb aţi in RV"),
    ("familia", "famil", "verb ia preceded by consonant l"),
    # prelude + postlude
    ("tăia", "tăi", "i between vowels marked I (consonant), restored"),
    ("steaua", "steau", "u marked U so step-0 aua cannot match; final a"),
    # no-ops
    ("naţional", "naţional", "no suffix matches any region"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_romanian_vocabulary(word, expected, rule):
    assert romanian_stem(word) == expected, rule


def test_romanian_comma_below_normalised():
    # U+0219/U+021B (comma below) are folded to the table's cedilla forms
    assert romanian_stem("acțiunile") == romanian_stem("acţiunile")
    assert romanian_stem("jurnaliști") == "jurnalist"


def test_romanian_regions():
    from searchengine_ray.text.stemmer import _ro_r1r2, _ro_rv

    # c-o (consonant+vowel) → RV after the third letter
    assert _ro_rv("copiilor") == 3
    # a-b (vowel+consonant) → RV after the next vowel
    assert _ro_rv("abilitate") == 3
    # first two letters vowels → RV after the next consonant
    assert _ro_rv("aur") == 3
    r1, r2 = _ro_r1r2("abilitate")
    assert (r1, r2) == (2, 4)


def test_romanian_index_end_to_end(ray_session, tmp_path):
    """Build a Romanian-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://ro.test/0", "copiii se joacă în parc"),
        ("https://ro.test/1", "un copil aleargă pe stradă"),
        ("https://ro.test/2", "lucrează la proiect toată ziua"),
        ("https://ro.test/3", "noi lucrăm împreună la birou"),
        ("https://ro.test/4", "trenul pleacă din gară"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="romanian", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "romanian"
    # copiii / copil both stem to copi-family
    res = s.search("copilului", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert "https://ro.test/1" in urls
    # lucrează / lucrăm conflate to lucr
    res2 = s.search("lucrând", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://ro.test/2", "https://ro.test/3"} <= urls2
