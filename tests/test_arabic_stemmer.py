"""Snowball Arabic stemmer: behavior pinned against an INDEPENDENT
compiled build of the official algorithm (PostgreSQL dict_snowball —
every expected value below was produced by ``ts_lexize('st_arabic',…)``,
never by the code under test; the bulk vocabulary lives in
tests/fixtures/snowball/arabic.tsv). Each entry names the rule
exercised, including the cursor-sharing prefix semantics that make
this algorithm tricky."""

import pyarrow.parquet as pq
import pytest

from searchengine_ray.text.stemmer import arabic_stem

# (word, expected, rule exercised)
VOCAB = [
    # definite articles: Checks1 (raw word) + Prefix_Step3a/3b
    ("الكتاب", "كتاب", "ال removed (len>4); defined blocks verb suffixes"),
    ("الفن", "الفن", "Checks1 matches (len>3) but Step3a needs len>4"),
    ("للكتاب", "كتاب", "لل removed"),
    ("بالكتاب", "كتاب", "بال removed (len>5)"),
    ("بالفن", "بالفن", "بال matched but len 5 is not > 5 — whole step "
     "fails, no retry with ب"),
    ("كالكتاب", "كتاب", "كال removed"),
    ("اللعب", "لعب", "longest prefix match is ال, not لل"),
    # conjunctions: Prefix_Step2, blocked before ا
    ("وكتاب", "كتاب", "و stripped (len>3, next != ا)"),
    ("والكتاب", "والكتاب", "وا blocks the strip AND وال is not in "
     "Checks1 — fully untouched"),
    ("فكتب", "كتب", "ف stripped"),
    ("فالكتاب", "فالكتاب", "فا blocks"),
    ("وفن", "وفن", "len 3 not > 3"),
    # ب / ك prefixes: ب strips (not before ا), bare ك never strips
    ("بكتاب", "كتاب", "ب stripped (len>3)"),
    ("باكتاب", "باكتاب", "با matched — always fails, no ب retry"),
    ("كعلم", "كعلم", "bare ك matched — always fails"),
    ("ككتاب", "كتاب", "doubled كك loses one"),
    # possessive/verb suffix chain; Step1 repeats
    ("كتابه", "كتاب", "VS1 ه"),
    ("كتابكما", "كتاب", "VS1 كما (len>=6)"),
    ("كتبناه", "كتب", "VS1 ه then VS1 repeats on نا"),
    ("كتبتموه", "كتب", "VS1 ه then VS2c تمو"),
    ("معلمون", "معلم", "VS2a ون (len>5)"),
    ("سنون", "سنون", "VS2a longest match ون fails its length test — "
     "no retry with ن"),
    ("كتبوا", "كتب", "VS2b وا"),
    ("كتبتم", "كتب", "VS2b تم"),
    ("كتبتما", "كتب", "VS2a تما"),
    # noun chain (runs when the verb chain matched nothing)
    ("مدرسة", "مدرس", "NS2c2 ة (len>=4)"),
    ("لغة", "لغة", "NS2c2 blocked at len 3"),
    ("مدرسةه", "مدرسة", "VS1 ه wins; verb success skips the noun "
     "chain so ة survives"),
    ("الطالبات", "طالب", "defined: NS2b ات then ال"),
    ("المعلمون", "معلم", "defined: NS1b ن then NS2a و then ال"),
    ("الذي", "الذ", "NS3 ي fires even on a defined word; ال kept "
     "(len 3 after, not > 4)"),
    ("مستشفى", "مستشفي", "no suffix matched → final ى → ي"),
    # hamza normalization (Normalize_post)
    ("أكتب", "اكتب", "initial أ → ا"),
    ("قرأ", "قرء", "FINAL hamza carrier → ء before the sweep"),
    ("لؤلؤ", "لولء", "final ؤ → ء, medial ؤ → و"),
    ("رئيس", "رييس", "medial ئ → ي"),
    ("مؤمن", "موم", "VS2a ن (len>=4) then ؤ → و"),
    # verb prefixes and the shared cursor
    ("سيكتبون", "يكتب", "ون then Step3_Verb strips the س of سي"),
    ("يستخدمون", "استخدم", "ون then Step4_Verb يست → است"),
    ("سييستخ", "ياستخ", "Step3 strips س, cursor advances, Step4 "
     "converts the يست AFTER the cursor"),
    ("ستستخط", "تستخط", "Step3 strips س; the surviving تست sits "
     "before the cursor so Step4 cannot see it"),
    ("أأكل", "اكل", "Prefix_Step1 أأ → أ (len>3), then the sweep"),
    ("أاعإدكهن", "اعاد", "VS1 repeats (هن then ك); Step1 أا → ا"),
    # Normalize_pre
    ("كَتَبَ", "كتب", "diacritics stripped"),
    ("ﻻزم", "لازم", "lam-alef ligature expanded"),
    ("ـ", "ـ", "a token of only tatweel/diacritics is returned as-is"),
]


@pytest.mark.parametrize("word,expected,rule", VOCAB,
                         ids=[w for w, _, _ in VOCAB])
def test_arabic_vocabulary(word, expected, rule):
    assert arabic_stem(word) == expected, rule


def test_arabic_index_round_trip(ray_session, tmp_path):
    """End-to-end: build an Arabic-stemmed index and search it — the
    same round trip the other 15 languages have."""
    import pyarrow as pa

    from searchengine_ray.build.pipeline import build_index
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.query.engine import Searcher

    docs = [
        "المعلمون يدرسون الطلاب في المدرسة",
        "الكتاب على الطاولة في المكتبة",
        "يستخدمون الحاسوب في الجامعة",
        "القرارات الحكومية الجديدة",
    ]
    src = str(tmp_path / "pages.parquet")
    pa.parquet.write_table(pa.table({
        "url": [f"https://ar.example.test/{i}" for i in range(len(docs))],
        "text": docs,
    }), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, IndexConfig(language="arabic", num_shards=1))
    s = Searcher(idx)
    hits = s.search("المعلم يدرس", n=4)
    assert hits.num_rows and hits["doc_id"][0].as_py() == 0  # معلم/درس
    hits2 = s.search("مكتبة الكتب", n=4)
    assert hits2.num_rows and hits2["doc_id"][0].as_py() == 1
