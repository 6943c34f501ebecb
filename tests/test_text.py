"""Text layer tests: Porter2 stemmer + tokenizer parity vs the reference.

The tokenizer-parity test imports the REFERENCE Tokenizer
(/root/reference/src/models/tokenizer.py) with nltk stubbed to our own
stemmer, which pins down every non-stemming behavior (punctuation map,
lowering, regex split, filters, ordering) against the real reference code.
The stemmer itself is pinned by an embedded vocabulary of published
Porter2 (snowballstem.org) input/output pairs.
"""

import string
import sys
import types

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.text.stemmer import CachedStemmer, stem
from searchengine_ray.text.tokenizer import (
    DEFAULT_STOP_WORDS,
    Tokenizer,
    load_stop_words,
)

# Published Porter2 behavior: examples from the snowballstem.org English
# stemmer description (step examples, exceptional forms, region examples).
PORTER2_PAIRS = {
    # step 1a examples
    "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
    "gaps": "gap", "kiwis": "kiwi",
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
    "news": "news", "howe": "howe", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
    # invariant after step 1a
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "earring": "earring", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed",
    # general forms
    "agreed": "agre", "agreement": "agreement",
    "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
    "generate": "generat", "generates": "generat", "generating": "generat",
    "generation": "generat", "generic": "generic", "general": "general",
    "generous": "generous", "communism": "communism", "arsenal": "arsenal",
    "hopping": "hop", "hoping": "hope", "hopped": "hop", "hope": "hope",
    "games": "game", "gaming": "game", "game": "game", "gamer": "gamer",
    "running": "run", "runner": "runner", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "sizes": "size",
    "happy": "happi", "happiness": "happi",
    "national": "nation", "rational": "ration", "relational": "relat",
    "conditional": "condit", "conditionally": "condit",
    "beautiful": "beauti", "beautifully": "beauti",
    "electricity": "electr", "electrical": "electr",
    "logic": "logic", "logical": "logic", "apologize": "apolog",
    "geology": "geolog", "crying": "cri", "string": "string",
    "meeting": "meet", "meetings": "meet", "luxuriated": "luxuri",
    "dies": "die", "die": "die", "denied": "deni", "cement": "cement",
    # short-word e restoration / doubles
    "bed": "bed", "beds": "bed", "embed": "emb", "shred": "shred",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    # y handling
    "cry": "cri", "by": "by", "say": "say", "boy": "boy", "enjoy": "enjoy",
    "youth": "youth", "boyishness": "boyish",
}


def test_porter2_vocabulary():
    bad = {w: (stem(w), e) for w, e in PORTER2_PAIRS.items() if stem(w) != e}
    assert not bad, f"stemmer mismatches: {bad}"


def test_short_words_unchanged():
    for w in ("a", "is", "it", "ox", ""):
        assert stem(w) == w


def test_cached_stemmer_consistent():
    cs = CachedStemmer()
    for w in PORTER2_PAIRS:
        assert cs.stem(w) == stem(w)
        assert cs.stem(w) == stem(w)  # cached path


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=20))
@settings(max_examples=300, deadline=None)
def test_stemmer_total_and_deterministic(w):
    s1 = stem(w)
    s2 = stem(w)
    assert s1 == s2
    assert isinstance(s1, str)
    assert len(s1) <= len(w) + 1  # only ever grows by the restored 'e'


# ---------------------------------------------------------------------------
# Tokenizer parity vs the actual reference implementation


def _load_reference_tokenizer():
    """Import reference Tokenizer with nltk stubbed to our stemmer."""
    nltk = types.ModuleType("nltk")
    nltk_stem = types.ModuleType("nltk.stem")
    nltk_snow = types.ModuleType("nltk.stem.snowball")

    class SnowballStemmer:
        def __init__(self, language):
            assert language == "english"

        def stem(self, w):
            return stem(w)

    nltk_snow.SnowballStemmer = SnowballStemmer
    nltk.stem = nltk_stem
    nltk_stem.snowball = nltk_snow
    sys.modules.setdefault("nltk", nltk)
    sys.modules["nltk.stem"] = nltk_stem
    sys.modules["nltk.stem.snowball"] = nltk_snow
    sys.path.insert(0, "/root/reference/src")
    import importlib

    mod = importlib.import_module("models.tokenizer")
    return mod.Tokenizer


NASTY_TEXTS = [
    "Hello, World! It's a test -- with_underscores and-dashes.",
    "tabs\tbecome\ttokens\nand newlines too\n\n",
    "naïve café résumé — em-dash…ellipsis «guillemets»",
    "UPPER lower MiXeD CaSe",
    "a ab abc abcd",  # min-length boundary cases
    "the and of a to stop words STOP The",
    "games gaming gamer caresses ponies ties",
    "123 4.56 7,8 9-10 a1b2",
    "  leading and trailing   spaces  ",
    "",
    "\t\n",
    "date: 2021-01-01 time: 12:34:56!",
    "ação çedilha 日本語 中文 русский",
]


@pytest.mark.parametrize("min_len,use_stop,use_stem", [
    (None, False, False),
    (0, False, False),
    (3, False, False),
    (3, True, False),
    (3, True, True),
    (None, True, True),
    (2, False, True),
])
def test_tokenizer_parity_vs_reference(tmp_path, min_len, use_stop, use_stem):
    RefTokenizer = _load_reference_tokenizer()
    stop_path = None
    if use_stop:
        stop_path = tmp_path / "stop.txt"
        stop_path.write_text("\n".join(sorted(DEFAULT_STOP_WORDS)))
    ref = RefTokenizer(
        min_token_length=min_len,
        stop_words_path=str(stop_path) if stop_path else None,
        stem_lang="english" if use_stem else None,
    )
    ours = Tokenizer(
        min_token_length=min_len,
        stop_words=load_stop_words(stop_path),
        language="english" if use_stem else None,
    )
    for text in NASTY_TEXTS:
        assert ours.tokenize(text) == ref.tokenize(text), repr(text)


def test_tab_newline_literal_tokens():
    t = Tokenizer(language=None)
    assert t.tokenize("a\tb") == ["a", "\t", "b"]
    assert t.tokenize("a\nb") == ["a", "\n", "b"]
    # min length 3 drops the 1-char \t/\n tokens
    t3 = Tokenizer(min_token_length=3, language=None)
    assert t3.tokenize("abc\tdef") == ["abc", "def"]


def test_ascii_punct_only():
    t = Tokenizer(language=None)
    # ASCII punctuation → space; Unicode punctuation kept
    assert t.tokenize("it's") == ["it", "s"]
    assert t.tokenize("it’s") == ["it’s"]
    assert all(c in string.punctuation for c in "'-_")


# Published examples from Porter 1980, "An algorithm for suffix
# stripping" (Program 14(3)) — the original-Porter vocabulary pin.
PORTER1_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter1_vocabulary():
    from searchengine_ray.text.stemmer import porter_stem

    bad = {w: (porter_stem(w), e) for w, e in PORTER1_PAIRS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_language_tokenizer():
    from searchengine_ray.text.tokenizer import Tokenizer

    tok = Tokenizer(min_token_length=3, language="porter")
    assert tok.tokenize("the ponies were motoring happily") == \
        ["the", "poni", "were", "motor", "happili"]
