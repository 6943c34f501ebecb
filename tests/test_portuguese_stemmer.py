"""Snowball Portuguese stemmer: vocabulary pinned from hand-traces of
the published algorithm (snowballstem.org, "The Portuguese stemming
algorithm" — no stemmer package ships in this container, so each
expected value below was derived by hand-executing the spec's steps
and annotating the rule exercised), plus an end-to-end Portuguese
index + search round trip (reference accepts any Snowball language,
tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import portuguese_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 1: standard suffixes, delete if in R2
    ("amoroso", "amor", "oso in R2 (R2 starts after 'amor')"),
    ("gostoso", "gostos",
     "oso NOT in R2 (R2 = final 'o'); no fallback; step-4 residual o"),
    ("importante", "import", "ante in R2"),
    ("organização", "organiz", "ã marked a~; aça~o in R2, deleted"),
    ("comunicação", "comunic", "aça~o in R2"),
    ("coração", "coraçã",
     "aça~o NOT in R2; step-4 residual o; a~ restored to ã"),
    ("corações", "coraçõ",
     "aço~es NOT in R2; step-2 'es' inside RV; o~ restored to õ"),
    ("quilométricas", "quilométr", "icas in R2"),
    ("possibilidade", "possibil",
     "idade in R2; remainder ends 'ibil' ≠ 'abil' so no further strip"),
    ("grandeza", "grandez",
     "eza NOT in R2 (R2 = final 'a'); step-4 residual a"),
    # step 1: amente/mente with secondary strips
    ("rapidamente", "rapid", "amente in R1; no iv/os/ic/ad follow-up"),
    ("logicamente", "logic",
     "amente in R1; trailing ic NOT in R2 so kept"),
    ("felizmente", "feliz", "mente in R2; no ante/avel/ível follow-up"),
    # step 2: verb suffixes inside RV (only when step 1 left the word)
    ("correndo", "corr", "endo in RV"),
    ("correr", "corr", "er in RV"),
    ("falaram", "fal", "aram in RV"),
    ("falou", "fal", "ou in RV"),
    ("meninas", "menin", "as in RV (no longer suffix matches)"),
    # step 4 residual (neither step 1 nor 2 altered)
    ("bonita", "bonit", "residual a in RV"),
    ("proposta", "propost", "residual a in RV"),
    ("última", "últim", "residual a; RV starts after first vowel run"),
    ("brasileiro", "brasileir", "residual o in RV"),
    ("nacional", "nacional", "no suffix matches anywhere; unchanged"),
    ("propaganda", "propagand", "residual a in RV"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_portuguese_vocabulary(word, expected, rule):
    assert portuguese_stem(word) == expected, rule


def test_portuguese_regions():
    from searchengine_ray.text.stemmer import _pt_r1r2, _pt_rv

    # gostoso: R1 after 'go|s', R2 after 'gosto|s' → only final 'o' in R2
    assert _pt_r1r2("gostoso") == (3, 6)
    # amoroso: R1 after initial vowel+cons 'am', R2 after 'amor'
    assert _pt_r1r2("amoroso") == (2, 4)
    assert _pt_rv("gostoso") == 3        # cons-vowel start → position 3
    assert _pt_rv("última") == 4         # vowel-cons start → next vowel


def test_portuguese_step5_contractions():
    # residual e in RV, then gu→g / ci→c contraction
    assert portuguese_stem("chegue") == "cheg"
    assert portuguese_stem("aquele") == "aquel"
    # ç→c when no residual e was removed
    assert portuguese_stem("coraç") == "corac"


def test_portuguese_index_end_to_end(ray_session, tmp_path):
    """Build a Portuguese-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://pt.test/0", "as meninas brincam no parque"),
        ("https://pt.test/1", "uma menina corre pela rua"),
        ("https://pt.test/2", "a organização do projeto nacional"),
        ("https://pt.test/3", "as organizações trabalham juntas"),
        ("https://pt.test/4", "o trem parte da estação central"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="portuguese", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "portuguese"
    res = s.search("meninas", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://pt.test/0", "https://pt.test/1"} <= urls
    res2 = s.search("organização", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://pt.test/2", "https://pt.test/3"} <= urls2
