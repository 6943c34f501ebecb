"""Snowball French stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The French stemming algorithm",
classic form without the later ë→He/ï→Hi revision — no stemmer package
ships in this container, so each expected value below was derived by
hand-executing the spec's steps and annotating the rule exercised),
plus an end-to-end French index + search round trip (reference accepts
any Snowball language, tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import french_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1: standard suffixes
    ("importance", "import", "ance in R2"),
    ("majestueux", "majestu", "eux in R2"),
    ("continuation", "continu", "ation in R2"),
    ("communication", "commun", "ation then ic, both R2"),
    ("qualité", "qualit", "ité not in R2 (qU mark); 2b é instead"),
    ("possibilité", "possibil", "ité in R2; abil does not match ibil"),
    ("rapidement", "rapid", "ement in RV"),
    ("établissement", "établ", "issement in R1 after non-vowel"),
    ("heureuse", "heureux", "euse not in R2 → eux in R1"),
    ("vendeuse", "vendeux", "euse not in R2 → eux in R1"),
    ("heureux", "heureux", "eux not in R2, nothing else applies"),
    ("évidemment", "évident", "emment→ent; 2a/2b find nothing"),
    ("abondamment", "abond", "amment→ant; then 2b ant"),
    ("vraiment", "vrai", "ment after vowel in RV; 2a/2b nothing"),
    # step 2a: i-verb suffixes after a non-vowel in RV
    ("finissait", "fin", "issait after n"),
    ("continuait", "continu", "it blocked (vowel before); 2b ait"),
    # step 2b: other verb suffixes
    ("aimaient", "aim", "aIent (marked I) in RV"),
    ("mangeaient", "mang", "aIent then the preceding e"),
    ("donnerait", "don", "erait; then un-double onn"),
    ("premier", "premi", "er"),
    ("payer", "pai", "er after Y-mark; step-3 Y→i"),
    ("parlions", "parlion", "ions not in R2 (RV=par exception); "
                            "step-4 s; residual ion not in R2"),
    # step 4: residual suffixes
    ("permission", "permiss", "ion in R2 preceded by s"),
    ("action", "action", "residual ion NOT in RV"),
    ("actions", "action", "step-4 s after n; ion not in RV"),
    ("voyages", "voyag", "step-4 s then residual e; Y unmarked"),
    ("voyage", "voyag", "residual e"),
    ("critique", "critiqu", "iqUe not in R2; residual e"),
    ("prière", "prier", "ière not in RV; residual e; step-6 è→e"),
    # step 5 un-double / step 6 un-accent
    ("tienne", "tien", "residual e then enn un-double"),
    ("espère", "esper", "residual e then è un-accent"),
    # no applicable suffix
    ("yeux", "yeux", "Y-mark makes eux position < R1"),
    ("important", "import", "2b ant"),
    ("azur", "azur", "no suffix"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_french_vocabulary(word, expected, rule):
    assert french_stem(word) == expected, rule


def test_french_marking_and_regions():
    from searchengine_ray.text.stemmer import _fr_mark, _fr_rv

    assert _fr_mark("voyages") == "voYages"      # y after vowel
    assert _fr_mark("payer") == "paYer"
    assert _fr_mark("critique") == "critiqUe"    # u after q
    assert _fr_mark("aimaient") == "aimaIent"    # i between vowels
    assert _fr_mark("yeux") == "Yeux"            # y before vowel
    # RV: par/col/tap exception, double-vowel start, default
    assert _fr_rv("parlions") == 3
    assert _fr_rv(_fr_mark("aimaient")) == 3
    assert _fr_rv("finissait") == 2


def test_french_index_end_to_end(ray_session, tmp_path):
    """Build a French-language index and verify stemmed matching: a
    query inflection retrieves docs containing other inflections of
    the same stem; manifest records the language."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://fr.test/0", "les voyages forment la jeunesse"),
        ("https://fr.test/1", "un voyage au bout du monde"),
        ("https://fr.test/2", "la continuation du projet commence"),
        ("https://fr.test/3", "nous continuait le travail hier"),
        ("https://fr.test/4", "le chat dort sur le toit"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="french", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "french"
    # voyages/voyage share the stem voyag
    res = s.search("voyages", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://fr.test/0", "https://fr.test/1"} <= urls
    # continuation / continuait share the stem continu
    res2 = s.search("continuation", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://fr.test/2", "https://fr.test/3"} <= urls2
