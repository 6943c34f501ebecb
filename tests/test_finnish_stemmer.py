"""Snowball Finnish stemmer: vocabulary pinned from hand-traces of
the published algorithm (snowballstem.org, "The Finnish stemming
algorithm" — no stemmer package ships in this container, so each
expected value below was derived by hand-executing the spec's steps
and annotating the rule exercised), plus an end-to-end Finnish index
+ search round trip (reference accepts any Snowball language,
tokenizer.py:24-33).

Semantics under test: every step matches the longest suffix lying
ENTIRELY within R1 (R2 for step 4 / sti / the mma-imma tail of step
5) — a shorter suffix can win when a longer one starts before the
region — while "preceded by" conditions read the full word; a failed
condition fails the whole step (no backtracking). Step 3 sets the
flag that decides whether step 5 strips i/j (case removed) or a
vowel-preceded t (not removed). The tidy steps (a)…(e) run in turn
on the evolving string, so (c)'s oj-strip can legitimately re-expose
(d)'s jo (kirjoja → kirj, conflating with kirja)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import finnish_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1: particles
    ("kirjakin", "kirj", "kin after a vowel; then tidy b"),
    ("tavallisesti", "tavallis", "sti in R2; tidy b"),
    ("helposti", "helpost", "sti matches but lies before R2 — no "
     "fallback, step 1 fails; tidy b strips the i"),
    # step 2: possessives
    ("taloni", "talo", "ni"),
    ("talossani", "talo", "ni, then case ssa"),
    ("talossaan", "talo", "an after ssa, then case ssa"),
    ("talolleen", "talo", "en after lle, then case lle"),
    ("taloineen", "talo", "en after ine, then case ine"),
    ("vastaukseni", "vastau", "ni leaves kse → ksi, then case ksi"),
    ("edeltäjiinsä", "edeltäj", "nsä; n after long ii deletes an i "
     "too; i-plural"),
    ("edeltäjistään", "edeltäj", "än after stä; case stä; i-plural"),
    # step 3: case endings
    ("kirjassa", "kirj", "ssa; tidy b strips the stem-final a"),
    ("kirja", "kirj", "bare a needs preceding cv (rj is cc) — "
     "untouched by step 3, tidy b strips it"),
    ("taloissa", "talo", "ssa, then i-plural (flag set)"),
    ("taloihin", "talo", "hin after its harmony vowel i, then "
     "i-plural"),
    ("talon", "talo", "genitive n in R1"),
    ("talojen", "talo", "n; tidy b strips e, tidy c strips the "
     "plural j"),
    ("tien", "tien", "genitive n lies before R1 — untouched"),
    ("sukuun", "suku", "n after long uu deletes the u too"),
    ("huoneeseen", "huone", "seen after long ee; tidy a undoubles"),
    ("huoneisiin", "huone", "siin after Vi; i-plural"),
    ("tavallisempaa", "tavallis", "a after cv; mpa in R2 (not after "
     "po); tidy b"),
    ("asia", "as", "a after cv (si); i-plural fires because a case "
     "ending was removed"),
    # step 4: comparatives
    ("onnellisempaa", "onnellis", "a after cv, then mpa in R2"),
    ("tapopompaa", "tapopomp", "synthetic: mpa blocked by preceding "
     "po, no fallback; tidy b"),
    ("suuremman", "suurem", "n removed; mma lies before R2 so step "
     "4 skips; tidy b + undouble"),
    # step 5: plurals
    ("asiat", "asia", "no case ending, so the vowel-preceded t "
     "goes; tidy b blocked (i is a vowel)"),
    ("pahimmat", "pahim", "t-plural; imma/mma lie before R2; tidy "
     "b + undouble"),
    ("onnellisimmat", "onnellis", "t-plural re-exposes imma in R2"),
    # step 6: tidying
    ("huone", "huone", "tidy b blocked: the n sits before R1 "
     "(r1=4), and both letters of cX must lie inside it"),
    ("kala", "kala", "tidy b needs both letters inside R1; the l "
     "sits before it"),
    ("kirjoja", "kirj", "tidy b, then oj (c), then the re-exposed "
     "jo (d) — cascades to conflate with kirja"),
    ("banjo", "banj", "tidy d strips o after j"),
    ("aatonaatto", "aatonaato", "spec example: undouble tt before "
     "a trailing vowel"),
    ("perheineen", "perh", "possessive en, case ine; tidy b — "
     "conflates with perhe"),
    ("perhe", "perh", "tidy b"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_finnish_vocabulary(word, expected, rule):
    assert finnish_stem(word) == expected, rule


def test_finnish_regions():
    from searchengine_ray.text.stemmer import _fi_r1_r2

    assert _fi_r1_r2("kirjassa") == (3, 6)
    # vowel-initial word: R1 right after the first consonant
    assert _fi_r1_r2("edeltäjiinsä") == (2, 4)
    # vowel cluster runs to the final n: R1 is empty (= len)
    assert _fi_r1_r2("tien") == (4, 4)


def test_finnish_conflation_classes():
    """Inflected forms of one lemma land on one stem."""
    groups = [
        ("talo", ["talo", "talon", "taloissa", "taloihin", "taloni",
                  "talossaan", "talolleen", "talojen", "taloineen"]),
        ("huone", ["huone", "huoneeseen", "huoneisiin"]),
        ("kirj", ["kirja", "kirjassa", "kirjakin", "kirjoja"]),
        ("edeltäj", ["edeltäjiinsä", "edeltäjistään"]),
        ("onnellis", ["onnellisempaa", "onnellisimmat"]),
    ]
    for stem_, words in groups:
        assert {finnish_stem(x) for x in words} == {stem_}


def test_finnish_index_end_to_end(ray_session, tmp_path):
    """Build a Finnish-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://fi.test/0", "kirjat ovat talossa"),
        ("https://fi.test/1", "talon ovi on auki"),
        ("https://fi.test/2", "huoneeseen tuli valoa"),
        ("https://fi.test/3", "pieni huone on kaunis"),
        ("https://fi.test/4", "juna saapuu asemalle"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="finnish", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "finnish"
    # talossa / talon conflate to talo
    res = s.search("taloissa", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://fi.test/0", "https://fi.test/1"} <= urls
    # huoneeseen / huone conflate to huone
    res2 = s.search("huoneisiin", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://fi.test/2", "https://fi.test/3"} <= urls2
