"""Snowball Italian stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Italian stemming
algorithm" — no stemmer package ships in this container, so each
expected value below was derived by hand-executing the spec's steps
and annotating the rule exercised), plus an end-to-end Italian index +
search round trip (reference accepts any Snowball language,
tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import italian_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 0: attached pronoun after a verb ending in RV
    ("portarci", "port", "ci after ar (b): pronoun→e, then step-2 are"),
    ("mandargli", "mand", "gli after ar (b)"),
    ("vedendolo", "ved", "lo after endo (a): delete, then step-2 endo"),
    # step 1: standard suffixes
    ("organizzazione", "organizz", "azione in R2"),
    ("abilità", "abil", "ità in R2; abil remainder not in R2"),
    ("felicità", "felic", "ità in R2; ic remainder not in R2"),
    ("impossibilità", "impossibil", "ità in R2; ibil ≠ abil"),
    ("rapidamente", "rapid", "amente in R1"),
    ("velocemente", "veloc", "mente in R2 then step-3a e"),
    ("cambiamento", "camb", "amento in RV then step-3a i"),
    # step 2: verb suffixes in RV
    ("mangiando", "mang", "ando then step-3a i... final i dropped"),
    ("parliamo", "parl", "iamo"),
    ("leggere", "legg", "ere"),
    ("continuerà", "continu", "erà"),
    ("uscire", "uscir", "ire blocked (not inside RV); step-3a e"),
    # step 3a/3b: residual vowel, preceding i, ch/gh
    ("gatto", "gatt", "o"),
    ("gatti", "gatt", "i"),
    ("bellezza", "bellezz", "a"),
    ("nazione", "nazion", "azione not in R2; step-3a e"),
    ("condizioni", "condizion", "i"),
    ("problema", "problem", "a"),
    ("ragione", "ragion", "e"),
    ("crocchio", "crocc", "o then preceding i (3a) then ch→c (3b)"),
    ("amiche", "amic", "iche not in R2; e then ch→c"),
    ("amico", "amic", "ico not in R2; o"),
    ("quale", "qual", "qU marking keeps RV past the u"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_italian_vocabulary(word, expected, rule):
    assert italian_stem(word) == expected, rule


def test_italian_marking():
    from searchengine_ray.text.stemmer import _it_mark, _it_rv

    assert _it_mark("quale") == "qUale"        # u after q
    assert _it_mark("gioia") == "gioIa"        # i between vowels
    assert _it_mark("perché") == "perchè"      # acute → grave
    assert _it_rv("gatto") == 3
    assert _it_rv("amiche") == 3               # a-m: after next vowel


def test_italian_index_end_to_end(ray_session, tmp_path):
    """Build an Italian-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://it.test/0", "i gatti dormono sul tetto"),
        ("https://it.test/1", "un gatto nero attraversa la strada"),
        ("https://it.test/2", "le condizioni del progetto"),
        ("https://it.test/3", "una condizione necessaria al lavoro"),
        ("https://it.test/4", "il treno parte dalla stazione"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="italian", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "italian"
    res = s.search("gatti", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://it.test/0", "https://it.test/1"} <= urls
    res2 = s.search("condizioni", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://it.test/2", "https://it.test/3"} <= urls2
