"""Snowball Russian stemmer: vocabulary pinned from hand-traces of the
published algorithm (snowballstem.org, "The Russian stemming algorithm"
— no stemmer package ships in this container, so each expected value
below was derived by hand-executing the spec's steps and annotating
the rule exercised), plus an end-to-end Russian index + search round
trip (reference accepts any Snowball language, tokenizer.py:24-33)."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import russian_stem

# (word, expected, rule exercised)
VOCAB = [
    # noun endings (step 1, last resort)
    ("книги", "книг", "noun 'и' in RV"),
    ("книга", "книг", "noun 'а' in RV"),
    ("годы", "год", "noun 'ы' in RV"),
    ("году", "год", "noun 'у' in RV"),
    ("жизнью", "жизн", "noun 'ью' in RV"),
    ("биологии", "биолог", "noun 'ии' in RV"),
    ("россия", "росс", "noun 'ия' in RV"),
    # adjective endings
    ("красивый", "красив", "adjective 'ый'"),
    ("красивая", "красив", "adjective 'ая'"),
    ("техническими", "техническ", "adjective 'ими'"),
    # adjectival = adjective + optional participle
    ("читающий", "чита",
     "adjective 'ий' then participle group-1 'ющ' preceded by 'а'"),
    ("бегающая", "бега",
     "adjective 'ая' then participle group-1 'ющ' preceded by 'а'"),
    # verb endings
    ("говорила", "говор", "verb group-2 'ила'"),
    ("говорить", "говор", "verb group-2 'ить'"),
    ("играет", "игра", "verb group-1 'ет' preceded by 'а'"),
    ("играют", "игра", "verb group-1 'ют' preceded by 'а'"),
    # reflexive then verb
    ("встречаться", "встреча",
     "reflexive 'ся' then verb group-1 'ть' preceded by 'а'"),
    # perfective gerund (terminates step 1 immediately)
    ("сделав", "сдела", "perfective gerund group-1 'в' preceded by 'а'"),
    ("прочитавши", "прочита",
     "perfective gerund group-1 'вши' preceded by 'а'"),
    # step 2: trailing и
    # step 3: derivational ость/ост only in R2
    ("возможность", "возможн",
     "noun 'ь' then derivational 'ост' in R2 (R2 starts at 'ность')"),
    ("гость", "гост",
     "noun 'ь'; 'ост' NOT in R2 (R2 empty) so kept"),
    # step 4: superlative + undouble
    ("умнейший", "умн", "adjective 'ий' then superlative 'ейш'"),
    # ё normalisation
    ("всё", "все",
     "ё→е; final 'е' is the first vowel so RV is empty → noun 'е' kept"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_russian_vocabulary(word, expected, rule):
    assert russian_stem(word) == expected, rule


def test_russian_regions():
    from searchengine_ray.text.stemmer import _ru_regions

    # противоестественном: RV after first vowel 'о'; R2 nested
    rv, r2 = _ru_regions("возможность")
    assert rv == 2          # в-о | з...
    assert r2 == 6          # R1 = 'можность' (3), R2 = 'ность' (6)


def test_russian_index_end_to_end(ray_session, tmp_path):
    """Build a Russian-language index and verify stemmed matching."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    rows = [
        ("https://ru.test/0", "новые книги на полке"),
        ("https://ru.test/1", "эта книга очень интересная"),
        ("https://ru.test/2", "поезд прибывает на станцию"),
        ("https://ru.test/3", "возможность читать книгу"),
        ("https://ru.test/4", "солнце светит ярко"),
    ]
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    src = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="russian", num_shards=2,
                                      use_stop_words=False))

    s = Searcher(idx)
    assert s.manifest["tokenizer"]["language"] == "russian"
    res = s.search("книги", 10, with_urls=True)
    urls = set(res["url"].to_pylist())
    # книги / книга / книгу all stem to книг
    assert {"https://ru.test/0", "https://ru.test/1",
            "https://ru.test/3"} <= urls
