"""Snowball Spanish stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Spanish stemming algorithm"
— no stemmer package ships in this container, so each expected value
below was derived by hand-executing the spec's steps and annotating the
rule exercised), plus an end-to-end Spanish index + search round trip
(reference accepts any Snowball language, tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import spanish_stem

# (word, expected, rule exercised)
VOCAB = [
    # step 0: attached pronoun after a verb ending in RV
    ("comiéndoselo", "com", "selo after iéndo (a): un-accent, then 2b"),
    ("enviándolos", "envi", "los after ándo (a): un-accent, then 2b ando"),
    ("levantarse", "levant", "se after ar (b), then 2b ar"),
    ("quedarme", "qued", "me after ar (b), then 2b ar"),
    # step 1: standard suffixes
    ("capitalismo", "capital", "ismo in R2"),
    ("problemático", "problemat", "ico in R2 + unaccent"),
    ("adorable", "ador", "able in R2"),
    ("importancia", "import", "ancia in R2"),
    ("organización", "organiz", "ación in R2"),
    ("clasificación", "clasif", "ación then ic, both R2"),
    ("biología", "biolog", "logía NOT in R2; 2b ía instead"),
    ("teología", "teolog", "logía not in R2; 2b ía"),
    ("revolución", "revolu", "ución→u in R2"),
    ("eficiencia", "eficient", "encia→ente in R2; step-3 e"),
    ("paciencia", "pacienci", "encia not in R2, no fallback; step-3 a"),
    ("presencia", "presenci", "encia not in R2; step-3 a"),
    ("lentamente", "lent", "amente in R1"),
    ("claramente", "clar", "amente in R1"),
    ("decisivamente", "decis", "amente then iv, R2"),
    ("felizmente", "feliz", "mente in R2"),
    ("tranquilidad", "tranquil", "idad in R2"),
    ("nacionalidad", "nacional", "idad in R2"),
    ("generosidad", "gener", "idad in R2; residual os in step 3"),
    ("funcionamiento", "funcion", "amiento in R2"),
    ("conocimiento", "conoc", "imiento in R2"),
    ("sentimiento", "sentimient", "imiento not in R2; step-3 o"),
    # step 2a: y-verb suffixes after u
    ("construyeron", "constru", "yeron in RV after u"),
    ("huyendo", "huyend", "yendo NOT inside RV (rv=3); step-3 o"),
    ("cayó", "cay", "yó not in RV; step-3 ó"),
    # step 2b: other verb suffixes
    ("corriendo", "corr", "iendo"),
    ("jugando", "jug", "ando"),
    ("hablaba", "habl", "aba"),
    ("comieron", "com", "ieron"),
    ("bebiendo", "beb", "iendo"),
    ("atacados", "atac", "ados"),
    ("caminar", "camin", "ar"),
    ("leyes", "ley", "es (yes blocked: not inside RV)"),
    ("vayas", "vay", "as (yas blocked: not inside RV)"),
    ("camiones", "camion", "es"),
    ("mujeres", "mujer", "es"),
    ("llegues", "lleg", "es + gu→g u-drop"),
    ("tengamos", "teng", "amos"),
    # step 3: residual suffix in RV
    ("gatos", "gat", "os"),
    ("niñas", "niñ", "as via 2b; ñ kept"),
    ("tuyo", "tuy", "o"),
    ("café", "caf", "é"),
    ("comité", "comit", "é"),
    ("sigue", "sig", "e + gu with u in RV"),
    ("pingüino", "pingüin", "o; diaeresis ü is NOT unaccented"),
    # no applicable suffix / too short
    ("azul", "azul", "no suffix"),
    ("ley", "ley", "rv = whole word, nothing in RV"),
    ("sol", "sol", "shorter than rv"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_spanish_vocabulary(word, expected, rule):
    assert spanish_stem(word) == expected, rule


def test_spanish_regions():
    from searchengine_ray.text.stemmer import _es_r1r2, _es_rv

    # cons+vowel start → rv after 3rd letter
    assert _es_rv("gatos") == 3
    # 2nd letter consonant → after next vowel (atacados: a-t-a…)
    assert _es_rv("atacados") == 3
    # first two letters vowels → after next consonant (aire: a-i-r…)
    assert _es_rv("aire") == 3
    # importancia: R1 after 'imp', R2 after 'ortanc' boundary
    r1, r2 = _es_r1r2("importancia")
    assert (r1, r2) == (2, 5)


def test_spanish_index_end_to_end(ray_session, tmp_path):
    """Build a Spanish-language index and verify stemmed matching: a
    query inflection retrieves docs containing other inflections of the
    same stem; manifest records the language."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://es.test/0", "los gatos corren por la casa"),
        ("https://es.test/1", "un gato duerme en el sol"),
        ("https://es.test/2", "la organización de los datos"),
        ("https://es.test/3", "organizaciones procesando información"),
        ("https://es.test/4", "niños jugando en el parque"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="spanish", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "spanish"
    # gatos stems to gat, gato → gat: both docs match either inflection
    res = s.search("gatos", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    assert {"https://es.test/0", "https://es.test/1"} <= urls
    # organización / organizaciones share the stem organiz
    res2 = s.search("organización", 10, with_urls=True)
    urls2 = set(res2["url"].to_pylist())
    assert {"https://es.test/2", "https://es.test/3"} <= urls2
