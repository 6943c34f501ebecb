"""Porter2 (Snowball English) stemmer, implemented from scratch.

Source of truth: the published Snowball English stemmer algorithm
(snowballstem.org, "The English (Porter2) stemming algorithm") — public
knowledge. The reference engine delegates stemming to
``nltk.stem.snowball.SnowballStemmer`` (reference ``tokenizer.py:59-70``),
which implements this same public algorithm; neither nltk nor any stemmer
package is available here, so this is a clean-room implementation of the
spec.

Semantics mirrored from the reference tokenizer (``tokenizer.py:59-70``):
the stem function is pure; callers memoize results per worker process
(reference keeps an unbounded ``transforms`` dict — ST1 in SURVEY.md §2.3).

Implemented languages: 'english' (Porter2), 'porter' (the original 1980
algorithm), german, spanish, french, italian, portuguese, dutch,
russian, swedish, danish and norwegian (each clean-room from its
published snowballstem.org spec). The reference's baseline config and all its
published numbers use english (reference ``README.md:200-208``).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# Exceptional forms (spec: "exceptional forms" table).
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a (spec: "Following step 1a, leave the following
# invariant").
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# Step 2 suffix → replacement, longest-match-first. ``None`` replacement
# marks conditional rules handled inline.
_STEP2 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),   # → og if preceded by l
    ("li", None),    # → delete if preceded by a valid li-ending
)

_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ative", None),  # → delete if in R2
    ("ful", ""),
    ("ness", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion",  # special: delete only if preceded by s or t
    "al", "er", "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _mark_ys(word: str) -> str:
    """Set initial y, and y after a vowel, to Y (consonant marker)."""
    if "y" not in word:
        return word
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _compute_r1(word: str) -> int:
    # Spec exception: gener-, commun-, arsen- prefixes pin R1.
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _compute_r2(word: str, r1: int) -> int:
    for i in range(r1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """True if ``word`` ends in a short syllable.

    Short syllable = vowel followed by a non-vowel other than w, x or Y,
    preceded by a non-vowel; OR a vowel at the beginning of the word
    followed by a non-vowel.
    """
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            b in _VOWELS
            and c not in _VOWELS
            and c not in "wxY"
            and a not in _VOWELS
        )
    return False


def _contains_vowel(segment: str) -> bool:
    return any(ch in _VOWELS for ch in segment)


def stem(word: str) -> str:
    """Stem one already-lowercased token. Pure function."""
    if len(word) <= 2:
        return word

    if word[0] == "'":
        word = word[1:]
        if len(word) <= 2:
            return word

    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    word = _mark_ys(word)
    r1 = _compute_r1(word)
    r2 = _compute_r2(word, r1)

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    # Step 0: longest of  '  's  's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word

    # Step 1b
    step1b_suffix = None
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(suf):
            step1b_suffix = suf
            break
    if step1b_suffix in ("eed", "eedly"):
        if in_r1(step1b_suffix):
            word = word[: -len(step1b_suffix)] + "ee"
    elif step1b_suffix is not None:
        preceding = word[: -len(step1b_suffix)]
        if _contains_vowel(preceding):
            word = preceding
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_DOUBLES):
                word = word[:-1]
            elif r1 >= len(word) and _ends_short_syllable(word):
                # "the word is short": ends in a short syllable and R1 null
                word += "e"

    # Step 1c: y/Y → i if preceded by a non-vowel which is not the first
    # letter of the word.
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Step 2 (in R1)
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 3 (in R1)
    for suf, repl in _STEP3:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + repl
            break

    # Step 4 (in R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if in_r2("e"):
            word = word[:-1]
        elif in_r1("e") and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and in_r2("l"):
        word = word[:-1]

    return word.replace("Y", "y")


class CachedStemmer:
    """Memoizing stemmer — mirrors the reference's per-process
    ``transforms`` cache (reference ``tokenizer.py:30,63-68``, ST1).
    ``algorithm`` selects from the STEMMERS registry (default Porter2)."""

    __slots__ = ("_cache", "_fn")

    def __init__(self, algorithm: str = "english") -> None:
        from searchengine_ray.text import stemmer as _mod

        self._cache: dict[str, str] = {}
        self._fn = _mod.STEMMERS[algorithm]

    def stem(self, word: str) -> str:
        cached = self._cache.get(word)
        if cached is None:
            cached = self._fn(word)
            self._cache[word] = cached
        return cached


# -- original Porter (1980) ------------------------------------------------
# Clean-room implementation of M.F. Porter, "An algorithm for suffix
# stripping", Program 14(3) 1980 — the 'porter' language option of the
# Snowball family (the reference's SnowballStemmer accepts it,
# reference tokenizer.py:24-33). This is the PAPER's algorithm; nltk's
# default adds its own extensions, which are intentionally not copied.

_P_VOWELS = "aeiou"


def _p_is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _P_VOWELS:
        return False
    if c == "y":
        return i == 0 or not _p_is_cons(word, i - 1)
    return True


def _p_measure(stem_: str) -> int:
    """m in [C](VC)^m[V] over the consonant/vowel run structure."""
    forms = ""
    for i in range(len(stem_)):
        c = _p_is_cons(stem_, i)
        if not forms or (forms[-1] == "c") != c:
            forms += "c" if c else "v"
    return forms.count("vc")


def _p_has_vowel(stem_: str) -> bool:
    return any(not _p_is_cons(stem_, i) for i in range(len(stem_)))


def _p_double_cons(stem_: str) -> bool:
    return (len(stem_) >= 2 and stem_[-1] == stem_[-2]
            and _p_is_cons(stem_, len(stem_) - 1))


def _p_cvc(stem_: str) -> bool:
    """*o: ends cvc where the final c is not w, x or y."""
    if len(stem_) < 3:
        return False
    return (
        _p_is_cons(stem_, len(stem_) - 3)
        and not _p_is_cons(stem_, len(stem_) - 2)
        and _p_is_cons(stem_, len(stem_) - 1)
        and stem_[-1] not in "wxy"
    )


_P_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_P_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_P_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Original Porter algorithm, steps 1a–5b, longest-match per step."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _p_measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _p_has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _p_has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _p_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _p_measure(w) == 1 and _p_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _p_has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m > 0)
    for suf, rep in _P_STEP2:
        if w.endswith(suf):
            st = w[: len(w) - len(suf)]
            if _p_measure(st) > 0:
                w = st + rep
            break

    # Step 3 (m > 0)
    for suf, rep in _P_STEP3:
        if w.endswith(suf):
            st = w[: len(w) - len(suf)]
            if _p_measure(st) > 0:
                w = st + rep
            break

    # Step 4 (m > 1; 'ion' additionally needs stem ending s or t)
    for suf in _P_STEP4:
        if w.endswith(suf):
            st = w[: len(w) - len(suf)]
            if _p_measure(st) > 1 and (
                suf != "ion" or (st and st[-1] in "st")
            ):
                w = st
            break

    # Step 5a
    if w.endswith("e"):
        st = w[:-1]
        m = _p_measure(st)
        if m > 1 or (m == 1 and not _p_cvc(st)):
            w = st
    # Step 5b
    if _p_measure(w) > 1 and _p_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# -- German (Snowball) -----------------------------------------------------
# Clean-room implementation of the published Snowball German stemming
# algorithm (snowballstem.org, "The German stemming algorithm") — the
# same public spec nltk's SnowballStemmer('german') implements
# (reference tokenizer.py:24-33 accepts any Snowball language name).
# Includes the spec's -niss s-drop after removing e/en/es. The newer
# spec revision's 'syst'-exception on -em is deliberately NOT applied:
# both independent implementations available offline (nltk's port and
# PostgreSQL's compiled snowball 2.x dictionaries, the fixture oracle)
# predate it and stem system → syst.

_G_VOWELS = frozenset("aeiouyäöü")
_G_S_ENDINGS = frozenset("bdfghklmnrt")
_G_ST_ENDINGS = frozenset("bdfghklmnt")


def _g_mark(word: str) -> str:
    """ß→ss; u/y BETWEEN vowels upper-cased so they count as consonants
    (spec pre-step)."""
    word = word.replace("ß", "ss")
    if len(word) < 3:
        return word
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in ("u", "y") and word[i - 1] in _G_VOWELS \
                and word[i + 1] in _G_VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def _g_regions(word: str) -> tuple[int, int]:
    """(r1, r2) start indexes; r1 additionally moved right so at least
    3 letters precede it (spec: 'the region before R1 … at least 3
    letters')."""
    n = len(word)

    def after_first_nonvowel_after_vowel(start: int) -> int:
        i = start
        while i < n and word[i] not in _G_VOWELS:
            i += 1
        while i < n and word[i] in _G_VOWELS:
            i += 1
        return min(n, i + 1) if i < n else n

    r1 = after_first_nonvowel_after_vowel(0)
    r2 = after_first_nonvowel_after_vowel(r1)
    return max(r1, 3), r2


def german_stem(word: str) -> str:
    """Snowball German stem of a lower-case word."""
    w = _g_mark(word.lower())
    r1, r2 = _g_regions(w)

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # Step 1 — longest of: (a) em ern er, (b) e en es, (c) s
    if w.endswith("ern") and in_r1("ern"):
        w = w[:-3]
    elif w.endswith("em") and in_r1("em"):
        w = w[:-2]
    elif w.endswith("er") and in_r1("er"):
        w = w[:-2]
    elif w.endswith(("en", "es")) and in_r1("en"):
        w = w[:-2]
        if w.endswith("niss"):   # spec: e.g. verständnisse → verständnis
            w = w[:-1]
    elif w.endswith("e") and in_r1("e"):
        w = w[:-1]
        if w.endswith("niss"):
            w = w[:-1]
    elif w.endswith("s") and in_r1("s") and len(w) >= 2 \
            and w[-2] in _G_S_ENDINGS:
        w = w[:-1]

    # Step 2 — longest of: (a) en er est, (b) st
    if w.endswith("est") and in_r1("est"):
        w = w[:-3]
    elif w.endswith(("en", "er")) and in_r1("en"):
        w = w[:-2]
    elif w.endswith("st") and in_r1("st") and len(w) >= 6 \
            and w[-3] in _G_ST_ENDINGS:
        w = w[:-2]

    # Step 3 — d-suffixes
    if w.endswith(("end", "ung")):
        if in_r2("end"):
            w = w[:-3]
            if w.endswith("ig") and in_r2("ig") and not w[:-2].endswith("e"):
                w = w[:-2]
    elif w.endswith(("ig", "ik")):
        if in_r2("ig") and not w[:-2].endswith("e"):
            w = w[:-2]
    elif w.endswith("isch"):
        if in_r2("isch") and not w[:-4].endswith("e"):
            w = w[:-4]
    elif w.endswith(("lich", "heit")):
        if in_r2("lich"):
            w = w[:-4]
            if w.endswith(("er", "en")) and in_r1("er"):
                w = w[:-2]
    elif w.endswith("keit"):
        if in_r2("keit"):
            w = w[:-4]
            if w.endswith("lich") and in_r2("lich"):
                w = w[:-4]
            elif w.endswith("ig") and in_r2("ig"):
                w = w[:-2]

    # Post: unmark U/Y, strip umlauts
    return (w.replace("U", "u").replace("Y", "y")
             .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Snowball Spanish stemmer, clean-room from the published algorithm
# (snowballstem.org, "The Spanish stemming algorithm") — public knowledge
# (reference tokenizer.py:24-33 accepts any Snowball language name).
# Region semantics (from the Snowball program structure): steps 0, 2a, 2b
# and 3 match their suffix ONLY within RV (a longer list entry extending
# past RV cannot block a shorter one inside it); step 1 longest-matches
# over the whole word and then tests R1/R2, with no shorter-suffix
# fallback on failure.

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo")
# case (a): delete pronoun + un-accent the verb ending; (b): delete
_ES_PRON_ACCENTED = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_PLAIN = ("iendo", "ando", "ar", "er", "ir")

# step 1: (suffixes…, action) — longest match over the WHOLE word wins
_ES_STEP1 = [
    (("amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
      "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
      "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa"),
     "del_r2"),
    (("aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
      "ancia", "ador", "ante"), "del_r2_ic"),
    (("logías", "logía"), "log"),
    (("uciones", "ución"), "u"),
    (("encias", "encia"), "ente"),
    (("amente",), "amente"),
    (("mente",), "mente"),
    (("idades", "idad"), "idad"),
    (("ivas", "ivos", "iva", "ivo"), "iva"),
]

_ES_STEP2A = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
              "yes", "ya", "ye", "yo", "yó")

_ES_STEP2B_GU = ("emos", "éis", "en", "es")   # delete; gu → drop the u
_ES_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
    "aríais", "eríais", "iríais", "aremos", "eremos", "iremos",
    "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
    "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
    "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
    "aron", "ando", "abas", "adas", "idas", "aras", "ases", "íais",
    "ados", "idos", "amos", "imos",
    "aré", "ará", "eré", "erá", "iré", "irá", "aba", "ada", "ida",
    "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís",
)

_ES_STEP3_DEL = ("os", "a", "o", "á", "í", "ó")


def _es_rv(w: str) -> int:
    """RV start (spec): 2nd letter consonant → after the next vowel;
    first two letters vowels → after the next consonant; else (cons +
    vowel) → after the third letter; end of word if not found."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        for i in range(2, n):
            if w[i] in _ES_VOWELS:
                return i + 1
        return n
    if w[0] in _ES_VOWELS:
        for i in range(2, n):
            if w[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


def _es_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _ES_VOWELS:
            i += 1
        while i < n and w[i] in _ES_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return r1, after(r1)


def _es_unaccent(w: str) -> str:
    for a, b in (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"),
                 ("ú", "u")):
        w = w.replace(a, b)
    return w


def spanish_stem(word: str) -> str:
    """Snowball Spanish stem of a lower-case word."""
    w = word.lower()
    rv = _es_rv(w)
    r1, r2 = _es_r1r2(w)

    def in_rv(wd: str, suffix_len: int) -> bool:
        return len(wd) - suffix_len >= rv

    def in_r1(wd: str, suffix_len: int) -> bool:
        return len(wd) - suffix_len >= r1

    def in_r2(wd: str, suffix_len: int) -> bool:
        return len(wd) - suffix_len >= r2

    # Step 0 — attached pronoun (everything inside RV)
    for p in _ES_PRONOUNS:
        if not (w.endswith(p) and in_rv(w, len(p))):
            continue
        base = w[: len(w) - len(p)]
        done = False
        for acc, plain in zip(_ES_PRON_ACCENTED, _ES_PRON_PLAIN):
            if base.endswith(acc) and in_rv(base, len(acc)):
                w = base[: len(base) - len(acc)] + plain
                done = True
                break
        if not done:
            for plain in _ES_PRON_PLAIN:
                if base.endswith(plain) and in_rv(base, len(plain)):
                    w = base
                    done = True
                    break
        if not done and base.endswith("yendo") and in_rv(base, 5) \
                and base[: -5].endswith("u"):   # u may sit outside RV
            w = base
            done = True
        break          # longest pronoun decides; no shorter fallback

    # Step 1 — standard suffix removal (longest match over whole word)
    step1_removed = False
    matched = None
    for sfxs, action in _ES_STEP1:
        for s in sfxs:
            if w.endswith(s):
                if matched is None or len(s) > len(matched[0]):
                    matched = (s, action)
    if matched is not None:
        s, action = matched
        k = len(w) - len(s)
        if action == "del_r2" and in_r2(w, len(s)):
            w = w[:k]
            step1_removed = True
        elif action == "del_r2_ic" and in_r2(w, len(s)):
            w = w[:k]
            if w.endswith("ic") and in_r2(w, 2):
                w = w[:-2]
            step1_removed = True
        elif action == "log" and in_r2(w, len(s)):
            w = w[:k] + "log"
            step1_removed = True
        elif action == "u" and in_r2(w, len(s)):
            w = w[:k] + "u"
            step1_removed = True
        elif action == "ente" and in_r2(w, len(s)):
            w = w[:k] + "ente"
            step1_removed = True
        elif action == "amente" and in_r1(w, len(s)):
            w = w[:k]
            if w.endswith("iv") and in_r2(w, 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(w, 2):
                    w = w[:-2]
            elif (w.endswith(("os", "ic", "ad")) and in_r2(w, 2)):
                w = w[:-2]
            step1_removed = True
        elif action == "mente" and in_r2(w, len(s)):
            w = w[:k]
            for pre in ("ante", "able", "ible"):
                if w.endswith(pre) and in_r2(w, 4):
                    w = w[:-4]
                    break
            step1_removed = True
        elif action == "idad" and in_r2(w, len(s)):
            w = w[:k]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(w, len(pre)):
                    w = w[: len(w) - len(pre)]
                    break
            step1_removed = True
        elif action == "iva" and in_r2(w, len(s)):
            w = w[:k]
            if w.endswith("at") and in_r2(w, 2):
                w = w[:-2]
            step1_removed = True

    # Step 2a — verb suffixes beginning y (only if step 1 removed
    # nothing); suffix in RV, preceded by u (u may be outside RV)
    step2a_removed = False
    if not step1_removed:
        for s in sorted(_ES_STEP2A, key=len, reverse=True):
            if w.endswith(s) and in_rv(w, len(s)) \
                    and w[: len(w) - len(s)].endswith("u"):
                w = w[: len(w) - len(s)]
                step2a_removed = True
                break

    # Step 2b — other verb suffixes (only if 2a ran and removed
    # nothing); longest suffix lying inside RV
    if not step1_removed and not step2a_removed:
        best = None
        for s in _ES_STEP2B_GU:
            if w.endswith(s) and in_rv(w, len(s)):
                if best is None or len(s) > len(best[0]):
                    best = (s, True)
        for s in _ES_STEP2B:
            if w.endswith(s) and in_rv(w, len(s)):
                if best is None or len(s) > len(best[0]):
                    best = (s, False)
        if best is not None:
            s, gu = best
            w = w[: len(w) - len(s)]
            if gu and w.endswith("gu"):    # u need not be in RV
                w = w[:-1]

    # Step 3 — residual suffix (always; inside RV)
    if w.endswith(("e", "é")) and in_rv(w, 1):
        w = w[:-1]
        if w.endswith("gu") and in_rv(w, 1):   # the u must be in RV
            w = w[:-1]
    else:
        for s in _ES_STEP3_DEL:
            if w.endswith(s) and in_rv(w, len(s)):
                w = w[: len(w) - len(s)]
                break

    return _es_unaccent(w)


# ---------------------------------------------------------------------------
# Snowball French stemmer, clean-room from the published algorithm
# (snowballstem.org, "The French stemming algorithm") — public knowledge
# (reference tokenizer.py:24-33 accepts any Snowball language name).
# Implements the classic published algorithm (without the later ë→He /
# ï→Hi revision). Region semantics: steps 2a, 2b and the step-4 suffix
# table match only within RV; step 1 longest-matches over the whole
# (marked) word and then tests R1/R2/RV.

_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

_FR_STEP1 = [
    # (suffixes…, action key); longest match over the whole word wins
    (("ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
      "isme", "able", "iste", "eux"), "del_r2"),
    (("atrices", "ateurs", "ations", "atrice", "ateur", "ation"),
     "ateur"),
    (("logies", "logie"), "log"),
    (("usions", "utions", "usion", "ution"), "u"),
    (("ences", "ence"), "ent"),
    (("ements", "ement"), "ement"),
    (("ités", "ité"), "ite"),
    (("ives", "ifs", "ive", "if"), "if"),
    (("eaux",), "eaux"),
    (("aux",), "aux"),
    (("euses", "euse"), "euse"),
    (("issements", "issement"), "issement"),
    (("amment",), "amment"),
    (("emment",), "emment"),
    (("ments", "ment"), "ment"),
]

_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ira", "ies", "ît", "ie", "ir", "is", "it", "i",
)

_FR_STEP2B_IONS = ("ions",)
_FR_STEP2B_DEL = (          # group: delete
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_STEP2B_E = (            # group: delete; preceding e (in RV) too
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)

_FR_UNDOUBLE = ("enn", "onn", "ett", "ell", "eill")


def _fr_mark(word: str) -> str:
    """Left-to-right marking pass (spec prelude): u/i between vowels,
    y next to a vowel, u after q become U/I/Y (consonants)."""
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and chars[i - 1] in _FR_VOWELS
        next_v = i + 1 < n and chars[i + 1] in _FR_VOWELS
        if prev_v:
            if c == "u" and next_v:
                chars[i] = "U"
            elif c == "i" and next_v:
                chars[i] = "I"
            elif c == "y":
                chars[i] = "Y"
            continue
        if c == "y" and next_v:
            chars[i] = "Y"
        elif c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _fr_rv(w: str) -> int:
    """RV start (spec): 'par'/'col'/'tap' prefix → 3; two initial
    vowels → 3; else after the first vowel not at the beginning."""
    n = len(w)
    if w[:3] in ("par", "col", "tap"):
        return 3
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return min(3, n)
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


def _fr_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _FR_VOWELS:
            i += 1
        while i < n and w[i] in _FR_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return r1, after(r1)


def french_stem(word: str) -> str:
    """Snowball French stem of a lower-case word."""
    w = _fr_mark(word.lower())
    rv = _fr_rv(w)
    r1, r2 = _fr_r1r2(w)

    def in_rv(wd: str, k: int) -> bool:
        return len(wd) - k >= rv

    def in_r1(wd: str, k: int) -> bool:
        return len(wd) - k >= r1

    def in_r2(wd: str, k: int) -> bool:
        return len(wd) - k >= r2

    # ---- Step 1: standard suffix (longest match over the whole word)
    matched = None
    for sfxs, action in _FR_STEP1:
        for s in sfxs:
            if w.endswith(s) and (matched is None or len(s) > len(matched[0])):
                matched = (s, action)
    step1_altered = False
    ment_found = False
    if matched is not None:
        s, action = matched
        k = len(w) - len(s)
        if action == "del_r2":
            if in_r2(w, len(s)):
                w = w[:k]
                step1_altered = True
        elif action == "ateur":
            if in_r2(w, len(s)):
                w = w[:k]
                step1_altered = True
                if w.endswith("ic"):
                    if in_r2(w, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif action == "log":
            if in_r2(w, len(s)):
                w = w[:k] + "log"
                step1_altered = True
        elif action == "u":
            if in_r2(w, len(s)):
                w = w[:k] + "u"
                step1_altered = True
        elif action == "ent":
            if in_r2(w, len(s)):
                w = w[:k] + "ent"
                step1_altered = True
        elif action == "ement":
            if in_rv(w, len(s)):
                w = w[:k]
                step1_altered = True
                if w.endswith("iv") and in_r2(w, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(w, 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(w, 3):
                        w = w[:-3]
                    elif in_r1(w, 3):
                        w = w[:-3] + "eux"
                elif w.endswith(("abl", "iqU")) and in_r2(w, 3):
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and in_rv(w, 3):
                    w = w[:-3] + "i"
        elif action == "ite":
            if in_r2(w, len(s)):
                w = w[:k]
                step1_altered = True
                if w.endswith("abil"):
                    if in_r2(w, 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(w, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(w, 2):
                    w = w[:-2]
        elif action == "if":
            if in_r2(w, len(s)):
                w = w[:k]
                step1_altered = True
                if w.endswith("at") and in_r2(w, 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(w, 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif action == "eaux":
            w = w[:k] + "eau"
            step1_altered = True
        elif action == "aux":
            if in_r1(w, len(s)):
                w = w[:k] + "al"
                step1_altered = True
        elif action == "euse":
            if in_r2(w, len(s)):
                w = w[:k]
                step1_altered = True
            elif in_r1(w, len(s)):
                w = w[:k] + "eux"
                step1_altered = True
        elif action == "issement":
            if in_r1(w, len(s)) and k >= 1 and w[k - 1] not in _FR_VOWELS:
                w = w[:k]
                step1_altered = True
        elif action == "amment":
            ment_found = True
            if in_rv(w, len(s)):
                w = w[:k] + "ant"
                step1_altered = True
        elif action == "emment":
            ment_found = True
            if in_rv(w, len(s)):
                w = w[:k] + "ent"
                step1_altered = True
        elif action == "ment":
            ment_found = True
            # delete if preceded by a vowel in RV (the vowel in RV too)
            if k >= 1 and w[k - 1] in _FR_VOWELS and in_rv(w, len(s) + 1):
                w = w[:k]
                step1_altered = True

    # ---- Steps 2a/2b: verb suffixes
    do_2a = (not step1_altered) or ment_found
    altered = step1_altered
    if do_2a:
        removed_2a = False
        best = None
        for s in _FR_STEP2A:
            if w.endswith(s) and in_rv(w, len(s)) \
                    and (best is None or len(s) > len(best)):
                best = s
        if best is not None:
            k = len(w) - len(best)
            # preceded by a non-vowel which is itself in RV
            if k >= 1 and w[k - 1] not in _FR_VOWELS and k - 1 >= rv:
                w = w[:k]
                removed_2a = True
        altered = removed_2a
        if not removed_2a:
            best = None
            for group, sfxs in (("ions", _FR_STEP2B_IONS),
                                ("del", _FR_STEP2B_DEL),
                                ("e", _FR_STEP2B_E)):
                for s in sfxs:
                    if w.endswith(s) and in_rv(w, len(s)) \
                            and (best is None or len(s) > len(best[0])):
                        best = (s, group)
            altered = False
            if best is not None:
                s, group = best
                k = len(w) - len(s)
                if group == "ions":
                    if in_r2(w, len(s)):
                        w = w[:k]
                        altered = True
                elif group == "del":
                    w = w[:k]
                    altered = True
                else:
                    w = w[:k]
                    altered = True
                    if w.endswith("e") and in_rv(w, 1):
                        w = w[:-1]

    # ---- Step 3 (if the last obeyed step altered) else step 4
    if altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: final s unless preceded by a, i, o, u, è or s
        if w.endswith("s") and (len(w) < 2
                                or w[-2] not in frozenset("aiouès")):
            w = w[:-1]
        best = None
        for s in ("ière", "Ière", "ion", "ier", "Ier", "e", "ë"):
            if w.endswith(s) and in_rv(w, len(s)) \
                    and (best is None or len(s) > len(best)):
                best = s
        if best == "ion":
            k = len(w) - 3
            if in_r2(w, 3) and k >= 1 and w[k - 1] in ("s", "t") \
                    and k - 1 >= rv:
                w = w[:k]
        elif best in ("ière", "Ière", "ier", "Ier"):
            w = w[: len(w) - len(best)] + "i"
        elif best == "e":
            w = w[:-1]
        elif best == "ë" and w[:-1].endswith("gu"):
            w = w[:-1]

    # ---- Step 5: un-double
    for s in _FR_UNDOUBLE:
        if w.endswith(s):
            w = w[:-1]
            break

    # ---- Step 6: un-accent (é/è followed by ≥1 final non-vowels → e)
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_VOWELS:
        i -= 1
    if i >= 0 and i < len(w) - 1 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1:]

    # ---- Postlude: unmark
    return w.replace("U", "u").replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Snowball Italian stemmer, clean-room from the published algorithm
# (snowballstem.org, "The Italian stemming algorithm") — public
# knowledge (reference tokenizer.py:24-33 accepts any Snowball language
# name). Same region semantics as Spanish: steps 0, 2, 3a, 3b match
# their suffix only within RV; step 1 longest-matches over the whole
# marked word and then tests R1/R2/RV.

_IT_VOWELS = frozenset("aeiouàèìòù")

_IT_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
    "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
    "lo", "mi", "ne", "si", "ti", "vi",
)

_IT_STEP1 = [
    (("abile", "abili", "ibile", "ibili", "atrice", "atrici", "anza",
      "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste", "isti",
      "istà", "istè", "istì", "ante", "anti", "mente", "ico", "ici",
      "ica", "ice", "oso", "osi", "osa", "ose"), "del_r2"),
    (("azione", "azioni", "atore", "atori"), "del_r2_ic"),
    (("logia", "logie"), "log"),
    (("uzione", "uzioni", "usione", "usioni"), "u"),
    (("enza", "enze"), "ente"),
    (("amento", "amenti", "imento", "imenti"), "del_rv"),
    (("amente",), "amente"),
    (("ità",), "ita"),
    (("ivo", "ivi", "iva", "ive"), "iva"),
]

_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
    "ende", "endi", "endo", "erai", "erei", "iamo", "immo", "irai",
    "irei", "isca", "isce", "isci", "isco", "ano", "are", "ata",
    "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere", "erò",
    "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita", "ite",
    "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti",
    "uto", "ar", "ir",
)


def _it_mark(word: str) -> str:
    """Prelude: acute→grave accents; then u after q and u/i between
    vowels marked U/I (consonants)."""
    for a, b in (("á", "à"), ("é", "è"), ("í", "ì"), ("ó", "ò"),
                 ("ú", "ù")):
        word = word.replace(a, b)
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
            continue
        if c in ("u", "i") and 0 < i < n - 1 \
                and chars[i - 1] in _IT_VOWELS \
                and word[i + 1] in _IT_VOWELS:
            chars[i] = c.upper()
    return "".join(chars)


def _it_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _IT_VOWELS:
        for i in range(2, n):
            if w[i] in _IT_VOWELS:
                return i + 1
        return n
    if w[0] in _IT_VOWELS:
        for i in range(2, n):
            if w[i] not in _IT_VOWELS:
                return i + 1
        return n
    return 3


def _it_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _IT_VOWELS:
            i += 1
        while i < n and w[i] in _IT_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return r1, after(r1)


def italian_stem(word: str) -> str:
    """Snowball Italian stem of a lower-case word."""
    w = _it_mark(word.lower())
    rv = _it_rv(w)
    r1, r2 = _it_r1r2(w)

    def in_rv(wd: str, k: int) -> bool:
        return len(wd) - k >= rv

    def in_r1(wd: str, k: int) -> bool:
        return len(wd) - k >= r1

    def in_r2(wd: str, k: int) -> bool:
        return len(wd) - k >= r2

    # Step 0 — attached pronoun (all inside RV); (a) ando/endo:
    # delete; (b) ar/er/ir: replace the pronoun with e
    for p in _IT_PRONOUNS:
        if not (w.endswith(p) and in_rv(w, len(p))):
            continue
        base = w[: len(w) - len(p)]
        if base.endswith(("ando", "endo")) and in_rv(base, 4):
            w = base
        elif base.endswith(("ar", "er", "ir")) and in_rv(base, 2):
            w = base + "e"
        break           # longest pronoun decides; no shorter fallback

    # Step 1 — standard suffix (longest match over the whole word)
    matched = None
    for sfxs, action in _IT_STEP1:
        for s in sfxs:
            if w.endswith(s) and (matched is None
                                  or len(s) > len(matched[0])):
                matched = (s, action)
    step1_removed = False
    if matched is not None:
        s, action = matched
        k = len(w) - len(s)
        if action == "del_r2" and in_r2(w, len(s)):
            w = w[:k]
            step1_removed = True
        elif action == "del_r2_ic" and in_r2(w, len(s)):
            w = w[:k]
            if w.endswith("ic") and in_r2(w, 2):
                w = w[:-2]
            step1_removed = True
        elif action == "log" and in_r2(w, len(s)):
            w = w[:k] + "log"
            step1_removed = True
        elif action == "u" and in_r2(w, len(s)):
            w = w[:k] + "u"
            step1_removed = True
        elif action == "ente" and in_r2(w, len(s)):
            w = w[:k] + "ente"
            step1_removed = True
        elif action == "del_rv" and in_rv(w, len(s)):
            w = w[:k]
            step1_removed = True
        elif action == "amente" and in_r1(w, len(s)):
            w = w[:k]
            if w.endswith("iv") and in_r2(w, 2):
                w = w[:-2]
                if w.endswith("at") and in_r2(w, 2):
                    w = w[:-2]
            elif w.endswith(("os", "ic")) and in_r2(w, 2):
                w = w[:-2]
            elif w.endswith("abil") and in_r2(w, 4):
                w = w[:-4]
            step1_removed = True
        elif action == "ita" and in_r2(w, len(s)):
            w = w[:k]
            for pre in ("abil", "ic", "iv"):
                if w.endswith(pre) and in_r2(w, len(pre)):
                    w = w[: len(w) - len(pre)]
                    break
            step1_removed = True
        elif action == "iva" and in_r2(w, len(s)):
            w = w[:k]
            if w.endswith("at") and in_r2(w, 2):
                w = w[:-2]
                if w.endswith("ic") and in_r2(w, 2):
                    w = w[:-2]
            step1_removed = True

    # Step 2 — verb suffixes (only if step 1 removed nothing); longest
    # suffix lying inside RV
    if not step1_removed:
        best = None
        for s in _IT_STEP2:
            if w.endswith(s) and in_rv(w, len(s)) \
                    and (best is None or len(s) > len(best)):
                best = s
        if best is not None:
            w = w[: len(w) - len(best)]

    # Step 3a — final vowel (and a preceding i), inside RV
    if w and w[-1] in "aeioàèìò" and in_rv(w, 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(w, 1):
            w = w[:-1]

    # Step 3b — ch/gh → c/g inside RV
    if w.endswith(("ch", "gh")) and in_rv(w, 2):
        w = w[:-1]

    return w.replace("U", "u").replace("I", "i")


# -- Snowball Portuguese ---------------------------------------------------
# Clean-room implementation of the published Portuguese stemming
# algorithm (snowballstem.org, "The Portuguese stemming algorithm").
# Same among() semantics as the Spanish stemmer above: step 1
# longest-matches over the whole word then tests its R1/R2/RV
# condition with NO fallback; step 2 (and the residual steps) run
# inside the RV limit, so a longer suffix reaching outside RV cannot
# block a shorter one inside it.

_PT_VOWELS = frozenset("aeiouáéíóúâêô")

# group 1: delete if in R2
_PT_S1_R2_DEL = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "antes", "ância", "aça~o", "ezas", "icos", "icas",
    "ismos", "ível", "ável", "istas", "osos", "osas",
    "adora", "eza", "ico", "ica", "ismo", "ista", "oso", "osa",
    "ador", "ante",
)
_PT_S1_ALL = sorted(
    set(_PT_S1_R2_DEL) | {
        "logias", "logia", "uço~es", "uça~o", "ências", "ência",
        "amente", "mente", "idades", "idade",
        "ivas", "ivos", "iva", "ivo", "iras", "ira",
    },
    key=len, reverse=True,
)

_PT_STEP2 = sorted((
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
    "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
    "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
    "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
    "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir",
    "as", "adas", "idas", "ias", "arias", "erias", "irias", "arás",
    "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
    "irdes", "ares", "eres", "ires", "asses", "esses", "isses",
    "astes", "estes", "istes", "is", "ais", "eis", "íeis", "aríeis",
    "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis", "íreis",
    "ireis", "ásseis", "ésseis", "ísseis", "ásteis", "ésteis",
    "ísteis", "ados", "idos", "ámos", "amos", "íamos", "aríamos",
    "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos",
    "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
    "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
    "ira", "iras",
), key=len, reverse=True)


def _pt_rv(w: str) -> int:
    """Same RV rule as Spanish, over the Portuguese vowel set."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        for i in range(2, n):
            if w[i] in _PT_VOWELS:
                return i + 1
        return n
    if w[0] in _PT_VOWELS:
        for i in range(2, n):
            if w[i] not in _PT_VOWELS:
                return i + 1
        return n
    return 3


def _pt_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _PT_VOWELS:
            i += 1
        while i < n and w[i] in _PT_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return r1, after(r1)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese stem of a lower-case word. Nasalised vowels
    are marked ã→a~, õ→o~ for the duration (spec prelude) and restored
    at the end."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _pt_rv(w)
    r1, r2 = _pt_r1r2(w)

    def in_rv(wd: str, k: int) -> bool:
        return len(wd) - k >= rv

    def in_r1(wd: str, k: int) -> bool:
        return len(wd) - k >= r1

    def in_r2(wd: str, k: int) -> bool:
        return len(wd) - k >= r2

    altered = False

    # Step 1: standard suffix removal (longest over the whole word,
    # condition tested once, no fallback)
    matched = None
    for s in _PT_S1_ALL:
        if w.endswith(s):
            matched = s
            break
    if matched is not None:
        s = matched
        k = len(w) - len(s)
        if s in _PT_S1_R2_DEL:
            if in_r2(w, len(s)):
                w = w[:k]
                altered = True
        elif s in ("logias", "logia"):
            if in_r2(w, len(s)):
                w = w[:k] + "log"
                altered = True
        elif s in ("uço~es", "uça~o"):
            if in_r2(w, len(s)):
                w = w[:k] + "u"
                altered = True
        elif s in ("ências", "ência"):
            if in_r2(w, len(s)):
                w = w[:k] + "ente"
                altered = True
        elif s == "amente":
            if in_r1(w, len(s)):
                w = w[:k]
                altered = True
                if w.endswith("iv") and in_r2(w, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(w, 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) and in_r2(w, 2):
                    w = w[:-2]
        elif s == "mente":
            if in_r2(w, len(s)):
                w = w[:k]
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(w, 4):
                        w = w[:-4]
                        break
        elif s in ("idades", "idade"):
            if in_r2(w, len(s)):
                w = w[:k]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(w, len(pre)):
                        w = w[: len(w) - len(pre)]
                        break
        elif s in ("ivas", "ivos", "iva", "ivo"):
            if in_r2(w, len(s)):
                w = w[:k]
                altered = True
                if w.endswith("at") and in_r2(w, 2):
                    w = w[:-2]
        elif s in ("iras", "ira"):
            if in_rv(w, len(s)) and w[:k].endswith("e"):
                w = w[:k] + "ir"
                altered = True

    # Step 2: verb suffixes (only if step 1 changed nothing) —
    # longest suffix lying entirely inside RV
    if not altered:
        for s in _PT_STEP2:
            if w.endswith(s) and in_rv(w, len(s)):
                w = w[: len(w) - len(s)]
                altered = True
                break

    # Step 3: if step 1 or 2 altered, delete i after c (in RV)
    if altered:
        if w.endswith("i") and in_rv(w, 1) and w[:-1].endswith("c"):
            w = w[:-1]
    else:
        # Step 4: residual suffix (longest of os a i o á í ó in RV)
        for s in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(s) and in_rv(w, len(s)):
                w = w[: len(w) - len(s)]
                break

    # Step 5 (always): residual e/é/ê in RV, then gu/ci contraction;
    # else strip the cedilla
    if w[-1:] in ("e", "é", "ê") and in_rv(w, 1):
        w = w[:-1]
        if (w.endswith("gu") or w.endswith("ci")) and in_rv(w, 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# -- Snowball Dutch --------------------------------------------------------
# Clean-room implementation of the published Dutch stemming algorithm
# (snowballstem.org, "The Dutch stemming algorithm").

_NL_VOWELS = frozenset("aeiouyè")


def _nl_mark(w: str) -> str:
    """Prelude: strip umlauts/acutes, then upper-case initial y, y
    after a vowel, and i between vowels (left-to-right on the evolving
    string — a just-marked Y is a consonant for the next test)."""
    for a, b in (("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"),
                 ("ü", "u"), ("á", "a"), ("é", "e"), ("í", "i"),
                 ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    chars = list(w)
    n = len(chars)
    for i, ch in enumerate(chars):
        if ch == "y":
            if i == 0 or chars[i - 1] in _NL_VOWELS:
                chars[i] = "Y"
        elif ch == "i":
            if 0 < i < n - 1 and chars[i - 1] in _NL_VOWELS \
                    and chars[i + 1] in _NL_VOWELS:
                chars[i] = "I"
    return "".join(chars)


def _nl_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _NL_VOWELS:
            i += 1
        while i < n and w[i] in _NL_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    r2 = after(r1)
    # spec: the region before R1 must contain at least 3 letters
    return max(r1, min(3, n)), r2


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


def dutch_stem(word: str) -> str:
    """Snowball Dutch stem of a lower-case word."""
    w = _nl_mark(word.lower())
    r1, r2 = _nl_r1r2(w)

    def in_r1(wd: str, k: int) -> bool:
        return len(wd) - k >= r1

    def in_r2(wd: str, k: int) -> bool:
        return len(wd) - k >= r2

    # Step 1 (longest of heden / ene / en / se / s, condition tested
    # once, no fallback)
    for s in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(s):
            continue
        if s == "heden":
            if in_r1(w, 5):
                w = w[:-5] + "heid"
        elif s in ("ene", "en"):
            base = w[: len(w) - len(s)]
            if in_r1(w, len(s)) and base[-1:] and \
                    base[-1] not in _NL_VOWELS and not base.endswith("gem"):
                w = _nl_undouble(base)
        else:  # se / s — valid s-ending: non-vowel other than j
            base = w[: len(w) - len(s)]
            if in_r1(w, len(s)) and base[-1:] and \
                    base[-1] not in _NL_VOWELS and base[-1] != "j":
                w = base
        break

    # Step 2: delete e in R1 after a non-vowel, undouble
    e_removed = False
    if w.endswith("e") and in_r1(w, 1) and w[-2:-1] \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # Step 3a: heid (R2, not after c), then an en as in step 1
    if w.endswith("heid") and in_r2(w, 4) and w[-5:-4] != "c":
        w = w[:-4]
        if w.endswith("en"):
            base = w[:-2]
            if in_r1(w, 2) and base[-1:] and \
                    base[-1] not in _NL_VOWELS and not base.endswith("gem"):
                w = _nl_undouble(base)

    # Step 3b: d-suffixes (longest, condition tested once)
    for s in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(s):
            continue
        if s in ("end", "ing"):
            if in_r2(w, len(s)):
                w = w[: len(w) - len(s)]
                if w.endswith("ig") and in_r2(w, 2) and w[-3:-2] != "e":
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif s == "ig":
            if in_r2(w, 2) and w[-3:-2] != "e":
                w = w[:-2]
        elif s == "lijk":
            if in_r2(w, 4):
                w = w[:-4]
                # repeat step 2
                if w.endswith("e") and in_r1(w, 1) and w[-2:-1] \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif s == "baar":
            if in_r2(w, 4):
                w = w[:-4]
        elif s == "bar":
            if in_r2(w, 3) and e_removed:
                w = w[:-3]
        break

    # Step 4: undouble vowel — C aa/ee/oo/uu D (D a non-vowel != I)
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]

    return w.replace("I", "i").replace("Y", "y")


# -- Snowball Russian ------------------------------------------------------
# Clean-room implementation of the published Russian stemming
# algorithm (snowballstem.org, "The Russian stemming algorithm").
# All step-1/2/4 tests run inside the RV limit (group-1 endings must
# follow а or я, the а/я also inside RV); step 3 additionally
# requires R2. Among semantics: longest suffix fitting inside RV
# wins; a failed group-1 precondition fails the whole among (no
# fallback to a shorter suffix).

_RU_VOWELS = frozenset("аеиоуыэюя")

_RU_PERF_G1 = ("вшись", "вши", "в")
_RU_PERF_G2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PART_G1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PART_G2 = ("ивш", "ывш", "ующ")
_RU_VERB_G1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_G2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ия", "ья",
    "ию", "ью", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях",
    "ие", "ье", "еи", "ии", "а", "ев", "ов", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)


def _ru_regions(w: str) -> tuple[int, int]:
    """→ (rv, r2). RV = after the first vowel; R2 standard."""
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_VOWELS:
            rv = i + 1
            break

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _RU_VOWELS:
            i += 1
        while i < n and w[i] in _RU_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return rv, after(r1)


def _ru_among(w: str, rv: int, g1, g2):
    """Longest suffix (across both groups) fitting inside RV → the
    suffix-stripped word, or None. Group-1 endings must follow а/я
    (also inside RV); a failed group-1 test fails the whole among."""
    best, best_g1 = None, False
    for s in g1:
        if w.endswith(s) and len(w) - len(s) >= rv and \
                (best is None or len(s) > len(best)):
            best, best_g1 = s, True
    for s in g2:
        if w.endswith(s) and len(w) - len(s) >= rv and \
                (best is None or len(s) > len(best)):
            best, best_g1 = s, False
    if best is None:
        return None
    if best_g1:
        k = len(w) - len(best)
        if k - 1 < rv or w[k - 1] not in "ая":
            return None
    return w[: len(w) - len(best)]


def russian_stem(word: str) -> str:
    """Snowball Russian stem of a lower-case Cyrillic word (ё is
    normalised to е first, per the spec's assumption)."""
    w = word.lower().replace("ё", "е")
    rv, r2 = _ru_regions(w)

    # Step 1
    out = _ru_among(w, rv, _RU_PERF_G1, _RU_PERF_G2)
    if out is not None:
        w = out
    else:
        for s in ("ся", "сь"):
            if w.endswith(s) and len(w) - 2 >= rv:
                w = w[:-2]
                break
        # adjectival = adjective [+ optional preceding participle]
        out = _ru_among(w, rv, (), _RU_ADJECTIVE)
        if out is not None:
            w = out
            out = _ru_among(w, rv, _RU_PART_G1, _RU_PART_G2)
            if out is not None:
                w = out
        else:
            out = _ru_among(w, rv, _RU_VERB_G1, _RU_VERB_G2)
            if out is not None:
                w = out
            else:
                out = _ru_among(w, rv, (), _RU_NOUN)
                if out is not None:
                    w = out

    # Step 2: trailing и (in RV)
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # Step 3: derivational ост/ость in R2
    for s in ("ость", "ост"):
        if w.endswith(s) and len(w) - len(s) >= r2:
            w = w[: len(w) - len(s)]
            break

    # Step 4: superlative → undouble н; else undouble н; else drop ь
    done = False
    for s in ("ейше", "ейш"):
        if w.endswith(s) and len(w) - len(s) >= rv:
            w = w[: len(w) - len(s)]
            done = True
            break
    if done:
        if w.endswith("нн") and len(w) - 2 >= rv:
            w = w[:-1]
    elif w.endswith("нн") and len(w) - 2 >= rv:
        w = w[:-1]
    elif w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Snowball Scandinavian stemmers (Swedish, Danish, Norwegian), clean-room
# from the published algorithms (snowballstem.org, "The Swedish/Danish/
# Norwegian stemming algorithm") — public knowledge (reference
# tokenizer.py:24-33 accepts any Snowball language name).
#
# Shared semantics captured from the Snowball program structure:
# - R1 is the region after the first non-vowel following a vowel,
#   adjusted so at least 3 letters precede it.
# - Steps 1/2/3 wrap their suffix search in ``setlimit tomark p1``, so a
#   suffix only matches if it lies ENTIRELY within R1 — and, unlike the
#   German/Spanish step 1, a SHORTER suffix can match when a longer one
#   starts before R1 (the among runs inside the limited region).
# - The valid-s-ending test happens after the limit is restored, so the
#   preceding letter may sit outside R1.

def _scand_r1(word: str, vowels: frozenset) -> int:
    n = len(word)
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    r1 = min(n, i + 1) if i < n else n
    return max(r1, 3)


_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDINGS = frozenset("bcdfghjklmnoprtvy")
# step 1(a), length-sorted: longest suffix lying within R1 wins
_SV_STEP1 = (
    "heterna",
    "hetens",
    "anden", "heten", "heter", "arnas", "ernas", "ornas", "andes",
    "arens", "andet",
    "arna", "erna", "orna", "ande", "arne", "aste", "aren", "ades",
    "erns",
    "ade", "are", "ern", "ens", "het", "ast",
    "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e",
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def swedish_stem(word: str) -> str:
    """Snowball Swedish stem of a lower-case word."""
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)

    def within(sfx: str) -> bool:
        return w.endswith(sfx) and len(w) - len(sfx) >= r1

    # Step 1 — longest suffix within R1; 's' needs a valid s-ending
    for sfx in _SV_STEP1:
        if within(sfx):
            w = w[: -len(sfx)]
            break
    else:
        if within("s") and len(w) >= 2 and w[-2] in _SV_S_ENDINGS:
            w = w[:-1]

    # Step 2 — consonant pair within R1 → drop the last letter
    for pair in _SV_PAIRS:
        if within(pair):
            w = w[:-1]
            break

    # Step 3 — within R1: lig/ig/els delete; löst→lös; fullt→full
    if within("fullt") or within("löst"):
        w = w[:-1]
    elif within("lig") or within("els"):
        w = w[:-3]
    elif within("ig"):
        w = w[:-2]
    return w


_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_ENDINGS = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = (
    "erendes",
    "erende", "hedens",
    "ethed", "erede", "heden", "heder", "endes", "ernes", "erens",
    "erets",
    "ered", "ende", "erne", "eren", "erer", "heds", "enes", "eres",
    "eret",
    "hed", "ene", "ere", "ens", "ers", "ets",
    "en", "er", "es", "et",
    "e",
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")


def danish_stem(word: str) -> str:
    """Snowball Danish stem of a lower-case word."""
    w = word.lower()
    r1 = _scand_r1(w, _DA_VOWELS)

    def within(sfx: str) -> bool:
        return w.endswith(sfx) and len(w) - len(sfx) >= r1

    def consonant_pair() -> bool:
        return any(within(p) for p in _DA_PAIRS)

    # Step 1
    for sfx in _DA_STEP1:
        if within(sfx):
            w = w[: -len(sfx)]
            break
    else:
        if within("s") and len(w) >= 2 and w[-2] in _DA_S_ENDINGS:
            w = w[:-1]

    # Step 2 — consonant pair within R1 → drop the last letter
    if consonant_pair():
        w = w[:-1]

    # Step 3 — igst drops st unconditionally; then within R1:
    # løst→løs; ig/lig/elig/els delete AND repeat step 2
    if w.endswith("igst"):
        w = w[:-2]
    if within("løst"):
        w = w[:-1]
    else:
        for sfx in ("elig", "lig", "els", "ig"):
            if within(sfx):
                w = w[: -len(sfx)]
                if consonant_pair():
                    w = w[:-1]
                break

    # Step 4 — undouble: final double consonant with its last letter
    # in R1 → drop one
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_ENDINGS = frozenset("bcdfghjlmnoprtvyz")   # plus k-not-after-vowel
_NO_STEP1 = (
    "hetenes",
    "hetene", "hetens",
    "heten", "heter", "endes",
    "ande", "ende", "edes", "enes", "erte",
    "ede", "ane", "ene", "ens", "ers", "ets", "het", "ast", "ert",
    "en", "ar", "er", "as", "es", "et",
    "a", "e",
)
_NO_STEP3 = (
    "hetslov",
    "eleg", "elov", "slov", "elig",
    "leg", "eig", "lig", "els", "lov",
    "ig",
)


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian (Bokmål) stem of a lower-case word."""
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)

    def within(sfx: str) -> bool:
        return w.endswith(sfx) and len(w) - len(sfx) >= r1

    # Step 1 — longest within R1; erte/ert → 'er'; 's' needs a valid
    # s-ending (or k not preceded by a vowel)
    for sfx in _NO_STEP1:
        if within(sfx):
            if sfx in ("erte", "ert"):
                w = w[: -len(sfx)] + "er"
            else:
                w = w[: -len(sfx)]
            break
    else:
        if within("s") and len(w) >= 2 and (
            w[-2] in _NO_S_ENDINGS
            or (w[-2] == "k"
                and (len(w) < 3 or w[-3] not in _NO_VOWELS))
        ):
            w = w[:-1]

    # Step 2 — dt/vt within R1 → drop the last letter
    if within("dt") or within("vt"):
        w = w[:-1]

    # Step 3 — longest within R1 → delete
    for sfx in _NO_STEP3:
        if within(sfx):
            w = w[: -len(sfx)]
            break
    return w


# -- Snowball Romanian ------------------------------------------------------
# Clean-room implementation of the published Romanian stemming algorithm
# (snowballstem.org, "The Romanian stemming algorithm"). The reference
# accepts it through nltk's SnowballStemmer (reference tokenizer.py:24-33).
# Character convention: the suffix tables use the cedilla forms ş (U+015F)
# and ţ (U+0163) — the charset of the original spec revision that nltk
# implements; comma-below input (ș U+0219 / ț U+021B) is normalised to
# cedilla on entry. The verb-suffix table is reconstructed from the spec's
# conjugation-paradigm coverage (imperfect, simple perfect, pluperfect,
# present/subjunctive -ez/-esc families, infinitive, gerund); rare forms
# may diverge from nltk's table — every entry below is exercised by
# tests/test_romanian_stemmer.py hand-traces.

_RO_VOWELS = frozenset("aăâeiîou")


def _ro_mark(w: str) -> str:
    """Prelude: i and u between vowels become I/U (treated as consonants)."""
    out = list(w)
    for i in range(1, len(w) - 1):
        if (w[i] in "iu" and w[i - 1] in _RO_VOWELS
                and w[i + 1] in _RO_VOWELS):
            out[i] = "I" if w[i] == "i" else "U"
    return "".join(out)


def _ro_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _RO_VOWELS:
        for i in range(2, n):
            if w[i] in _RO_VOWELS:
                return i + 1
        return n
    if w[0] in _RO_VOWELS:
        for i in range(2, n):
            if w[i] not in _RO_VOWELS:
                return i + 1
        return n
    return 3


def _ro_r1r2(w: str) -> tuple[int, int]:
    n = len(w)

    def after(start: int) -> int:
        i = start
        while i < n and w[i] not in _RO_VOWELS:
            i += 1
        while i < n and w[i] in _RO_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = after(0)
    return r1, after(r1)


# step 0 (plural removal): suffix → replacement, longest-match-first;
# 'ile' additionally requires the preceding letters not be 'ab'.
_RO_STEP0 = (
    ("iilor", "i"),
    ("ului", ""), ("elor", "e"), ("iile", "i"), ("ilor", "i"),
    ("atei", "at"), ("aţie", "aţi"), ("aţia", "aţi"),
    ("aua", "a"), ("ele", "e"), ("iua", "i"), ("iei", "i"), ("ile", "i"),
    ("ul", ""), ("ea", "e"), ("ii", "i"),
)

# step 1 (combining suffixes, applied repeatedly in R1)
_RO_COMBINING = (
    ("abilităţi", "abil"), ("abilitate", "abil"), ("abilitati", "abil"),
    ("abilităi", "abil"),
    ("ibilitate", "ibil"),
    ("ivităţi", "iv"), ("ivitate", "iv"), ("ivitati", "iv"),
    ("ivităi", "iv"),
    ("icităţi", "ic"), ("icitate", "ic"), ("icitati", "ic"),
    ("icităi", "ic"), ("icatori", "ic"), ("icator", "ic"),
    ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
    ("icala", "ic"), ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
    ("iciv", "ic"), ("ical", "ic"),
    ("ativa", "at"), ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
    ("aţiune", "at"), ("atoare", "at"), ("atori", "at"),
    ("ătoare", "at"), ("ători", "at"),
    ("ativ", "at"), ("ator", "at"), ("ător", "at"),
    ("itiva", "it"), ("itive", "it"), ("itivi", "it"), ("itivă", "it"),
    ("iţiune", "it"), ("itoare", "it"), ("itori", "it"),
    ("itiv", "it"), ("itor", "it"),
)

# step 2 (standard suffixes, R2): plain delete set + ist-family + ţiune
_RO_STD_DELETE = frozenset((
    "at", "ata", "ată", "ati", "ate",
    "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite",
    "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă",
    "ator", "atori",
    "itate", "itati", "ităţi", "ităi",
    "iv", "iva", "ive", "ivi", "ivă",
))
_RO_STD_IST = frozenset(
    ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti"))
_RO_STEP2 = tuple(sorted(
    _RO_STD_DELETE | _RO_STD_IST | {"iune", "iuni"},
    key=len, reverse=True))

# verb suffixes (searched within the RV limit). True = delete only when
# preceded (within RV) by a non-vowel or by 'u'; False = always delete.
_RO_VERB = tuple(sorted((
    # infinitive / gerund
    ("are", True), ("ere", True), ("ire", True), ("âre", True),
    ("ind", True), ("ând", True), ("indu", True), ("ându", True),
    # present / subjunctive -ez / -esc families
    ("ez", True), ("ezi", True), ("eze", True), ("ează", True),
    ("esc", True), ("eşti", True), ("eşte", True), ("ească", True),
    ("ăsc", True), ("ăşti", True), ("ăşte", True),
    # imperfect
    ("am", True), ("ai", True), ("au", True),
    ("eam", True), ("eai", True), ("ea", True), ("eaţi", True),
    ("eau", True),
    ("iam", True), ("iai", True), ("ia", True), ("iaţi", True),
    ("iau", True),
    # simple perfect
    ("ui", True), ("uşi", True), ("urăm", True), ("urăţi", True),
    ("ură", True),
    ("aşi", True), ("arăm", True), ("arăţi", True), ("ară", True),
    ("âi", True), ("âşi", True), ("ârăm", True), ("ârăţi", True),
    ("âră", True),
    ("işi", True), ("irăm", True), ("irăţi", True), ("iră", True),
    # pluperfect (theme vowel + 'se' paradigm) — conditional like the
    # rest of group 1; their presence matters beyond the forms
    # themselves: the longest-match-no-backtrack rule means e.g.
    # 'frumoase' matches 'ase', fails the consonant-or-u test and must
    # NOT fall through to the unconditional 'se'
    ("ase", True), ("asem", True), ("aseşi", True), ("aserăm", True),
    ("aserăţi", True), ("aseră", True),
    ("ise", True), ("isem", True), ("iseşi", True), ("iserăm", True),
    ("iserăţi", True), ("iseră", True),
    ("âse", True), ("âsem", True), ("âseşi", True), ("âserăm", True),
    ("âserăţi", True), ("âseră", True),
    ("use", True), ("usem", True), ("useşi", True), ("userăm", True),
    ("userăţi", True), ("useră", True),
    # person endings / s-perfect / pluperfect: unconditional
    ("ăm", False), ("aţi", False), ("em", False), ("eţi", False),
    ("im", False), ("iţi", False), ("âm", False), ("âţi", False),
    ("sei", False), ("seşi", False), ("se", False),
    ("serăm", False), ("serăţi", False), ("seră", False),
    ("sesem", False), ("seseşi", False), ("sese", False),
    ("seserăm", False), ("seserăţi", False), ("seseră", False),
), key=lambda t: len(t[0]), reverse=True))


def romanian_stem(word: str) -> str:
    """Snowball Romanian stem of a lower-case word."""
    w = word.lower().replace("ș", "ş").replace("ț", "ţ")
    w = _ro_mark(w)
    rv = _ro_rv(w)
    r1, r2 = _ro_r1r2(w)

    def start(sfx: str) -> int:
        return len(w) - len(sfx)

    flag = False  # a suffix was removed by step 1 or step 2

    # Step 0: plural removal — longest match, then the in-R1 test once
    for sfx, repl in _RO_STEP0:
        if w.endswith(sfx):
            if start(sfx) >= r1 and not (
                    sfx == "ile" and w[: start(sfx)].endswith("ab")):
                w = w[: start(sfx)] + repl
            break

    # Step 1: combining suffixes — repeat until no replacement
    while True:
        for sfx, repl in _RO_COMBINING:
            if w.endswith(sfx):
                if start(sfx) >= r1:
                    w = w[: start(sfx)] + repl
                    flag = True
                    continue_outer = True
                else:
                    continue_outer = False
                break
        else:
            break
        if not continue_outer:
            break

    # Step 2: standard suffixes — longest match, then the in-R2 test once
    for sfx in _RO_STEP2:
        if w.endswith(sfx):
            if start(sfx) >= r2:
                if sfx in ("iune", "iuni"):
                    if w[: start(sfx)].endswith("ţ"):
                        w = w[: start(sfx) - 1] + "t"
                        flag = True
                elif sfx in _RO_STD_IST:
                    w = w[: start(sfx)] + "ist"
                    flag = True
                else:
                    w = w[: start(sfx)]
                    flag = True
            break

    # Step 3: verb suffixes — only if steps 1-2 removed nothing; the
    # search runs WITHIN the RV limit (a longer suffix crossing the RV
    # boundary is invisible; the preceded-by test must also stay in RV)
    if not flag:
        for sfx, cond in _RO_VERB:
            if w.endswith(sfx) and start(sfx) >= rv:
                k = start(sfx)
                if cond:
                    if k - 1 >= rv and (w[k - 1] not in _RO_VOWELS
                                        or w[k - 1] == "u"):
                        w = w[:k]
                else:
                    w = w[:k]
                break

    # Step 4: final vowel — longest of ie/a/e/i/ă, in-RV test once
    for sfx in ("ie", "a", "e", "i", "ă"):
        if w.endswith(sfx):
            if start(sfx) >= rv:
                w = w[: start(sfx)]
            break

    return w.replace("I", "i").replace("U", "u")


# -- Snowball Hungarian -----------------------------------------------------
# Clean-room implementation of the published Hungarian stemming algorithm
# (snowballstem.org, "The Hungarian stemming algorithm", Anna Tordai). The
# reference accepts it through nltk's SnowballStemmer (reference
# tokenizer.py:24-33). Hungarian is vowel-harmony agglutinative: the
# algorithm is nine ordered suffix-stripping passes over R1 (instrumental,
# frequent cases, special/other cases, factive, owned, singular/plural
# owner, plural), with consonant UNDOUBLING when the instrumental or
# factive suffix follows a doubled consonant or doubled digraph.

_HU_VOWELS = frozenset("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
# doubled digraphs first (undouble drops the first letter), then the
# plain double consonants (undouble drops one)
_HU_DOUBLE_TRI = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs")
_HU_DOUBLE_LETTERS = frozenset("bcdfgjklmnprstvz")


def _hu_r1(w: str) -> int:
    """R1: after the first consonant-or-digraph if the word begins with
    a vowel, else after the first vowel."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        for i in range(1, n):
            if w[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if w.startswith(d, i):
                        return min(n, i + len(d))
                return i + 1
        return n
    for i in range(1, n):
        if w[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_undouble(w: str) -> str:
    for d in _HU_DOUBLE_TRI:
        if w.endswith(d):
            return w[:-3] + d[1:]
    if (len(w) >= 2 and w[-1] == w[-2]
            and w[-1] in _HU_DOUBLE_LETTERS):
        return w[:-1]
    return w


def _hu_ends_double(w: str) -> bool:
    if any(w.endswith(d) for d in _HU_DOUBLE_TRI):
        return True
    return (len(w) >= 2 and w[-1] == w[-2]
            and w[-1] in _HU_DOUBLE_LETTERS)


# step 2 — frequent cases (delete, then final á→a / é→e)
_HU_CASE = tuple(sorted((
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
    "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként", "ként",
    "en", "on", "an", "ön", "n", "t",
), key=len, reverse=True))

# step 3 — special cases (suffix → replacement)
_HU_SPECIAL = (("ánként", "a"), ("án", "a"), ("én", "e"))

# step 4 — other cases
_HU_OTHER = (("astul", ""), ("estül", ""), ("ástul", "a"),
             ("éstül", "e"), ("stul", ""), ("stül", ""))

# step 6 — owned
_HU_OWNED = tuple(sorted((
    ("oké", ""), ("öké", ""), ("aké", ""), ("eké", ""), ("ké", ""),
    ("éi", ""), ("é", ""),
    ("áké", "a"), ("áéi", "a"),
    ("éké", "e"), ("ééi", "e"), ("éé", "e"),
), key=lambda t: len(t[0]), reverse=True))

# step 7 — singular owner
_HU_SING_OWNER = tuple(sorted((
    ("ünk", ""), ("unk", ""), ("nk", ""), ("juk", ""), ("jük", ""),
    ("uk", ""), ("ük", ""), ("em", ""), ("om", ""), ("am", ""),
    ("m", ""), ("od", ""), ("ed", ""), ("ad", ""), ("öd", ""),
    ("d", ""), ("ja", ""), ("je", ""), ("a", ""), ("e", ""), ("o", ""),
    ("ánk", "a"), ("ájuk", "a"), ("ám", "a"), ("ád", "a"), ("á", "a"),
    ("énk", "e"), ("éjük", "e"), ("ém", "e"), ("éd", "e"), ("é", "e"),
), key=lambda t: len(t[0]), reverse=True))

# step 8 — plural owner
_HU_PLUR_OWNER = tuple(sorted((
    ("jaim", ""), ("jeim", ""), ("aim", ""), ("eim", ""), ("im", ""),
    ("jaid", ""), ("jeid", ""), ("aid", ""), ("eid", ""), ("id", ""),
    ("jai", ""), ("jei", ""), ("ai", ""), ("ei", ""), ("i", ""),
    ("jaink", ""), ("jeink", ""), ("eink", ""), ("aink", ""),
    ("ink", ""),
    ("jaitok", ""), ("jeitek", ""), ("aitok", ""), ("eitek", ""),
    ("itek", ""),
    ("jeik", ""), ("jaik", ""), ("aik", ""), ("eik", ""), ("ik", ""),
    ("áim", "a"), ("áid", "a"), ("ái", "a"), ("áink", "a"),
    ("áitok", "a"), ("áik", "a"),
    ("éim", "e"), ("éid", "e"), ("éi", "e"), ("éink", "e"),
    ("éitek", "e"), ("éik", "e"),
), key=lambda t: len(t[0]), reverse=True))

# step 9 — plural
_HU_PLURAL = (("ák", "a"), ("ék", "e"), ("ök", ""), ("ok", ""),
              ("ek", ""), ("ak", ""), ("k", ""))


def hungarian_stem(word: str) -> str:
    """Snowball Hungarian stem of a lower-case word."""
    w = word.lower()
    r1 = _hu_r1(w)

    def start(sfx: str) -> int:
        return len(w) - len(sfx)

    # Step 1: instrumental al/el — in R1, preceded by a double
    # consonant, which is then undoubled
    for sfx in ("al", "el"):
        if w.endswith(sfx):
            k = start(sfx)
            if k >= r1 and _hu_ends_double(w[:k]):
                w = _hu_undouble(w[:k])
            break

    # Step 2: frequent cases — longest match, in-R1 test once; then
    # normalise a final á→a / é→e
    for sfx in _HU_CASE:
        if w.endswith(sfx):
            if start(sfx) >= r1:
                w = w[: start(sfx)]
                if w.endswith("á"):
                    w = w[:-1] + "a"
                elif w.endswith("é"):
                    w = w[:-1] + "e"
            break

    # Steps 3-9: longest match within the step, in-R1 test once, then
    # replace
    for table in (_HU_SPECIAL, _HU_OTHER):
        for sfx, repl in table:
            if w.endswith(sfx):
                if start(sfx) >= r1:
                    w = w[: start(sfx)] + repl
                break

    # Step 5: factive á/é — in R1, preceded by a double consonant,
    # which is then undoubled
    for sfx in ("á", "é"):
        if w.endswith(sfx):
            k = start(sfx)
            if k >= r1 and _hu_ends_double(w[:k]):
                w = _hu_undouble(w[:k])
            break

    for table in (_HU_OWNED, _HU_SING_OWNER, _HU_PLUR_OWNER,
                  _HU_PLURAL):
        for sfx, repl in table:
            if w.endswith(sfx):
                if start(sfx) >= r1:
                    w = w[: start(sfx)] + repl
                break

    return w


# ---------------------------------------------------------------------------
# Snowball Finnish stemmer, clean-room from the published algorithm
# (snowballstem.org, "The Finnish stemming algorithm") — public
# knowledge (reference tokenizer.py:24-33 accepts any Snowball
# language name).
#
# Structure captured from the published program:
# - R1/R2 are the standard regions (no 3-letter minimum, unlike the
#   Scandinavian stemmers).
# - Every step wraps its suffix search in ``setlimit tomark p1`` (p2
#   for step 4 and the mma/imma tail of step 5), so a suffix matches
#   only when it lies ENTIRELY within the region — a shorter suffix
#   can match when a longer one starts before the region — while the
#   chosen branch's "preceded by" condition is tested on the full
#   word (the preceding letters may sit before R1). Condition failure
#   fails the whole step: among does not backtrack to shorter
#   suffixes.
# - Step 3 (case endings) records whether it removed an ending;
#   step 5 (plural) branches on that flag.

_FI_VOWELS = frozenset("aeiouyäö")
_FI_LONG_VOWELS = frozenset(("aa", "ee", "ii", "oo", "uu", "ää", "öö"))

# step 3 hXn family: the suffix deletes only after its own harmony
# vowel (ahan/ehen/ihin/ohon/uhun/yhyn/ähän/öhön)
_FI_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
           "hun": "u", "hyn": "y", "hän": "ä", "hön": "ö"}

_FI_PARTICLES = ("kaan", "kään", "kin", "han", "hän", "sti",
                 "ko", "kö", "pa", "pä")
_FI_POSSESSIVES = ("nsa", "nsä", "mme", "nne", "si", "ni",
                   "an", "än", "en")
_FI_CASES = (
    "seen", "siin", "tten",
    "han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön",
    "den", "tta", "ttä", "ssa", "ssä", "sta", "stä",
    "lla", "llä", "lta", "ltä", "lle", "ine", "ksi",
    "ta", "tä", "na", "nä",
    "a", "ä", "n",
)
_FI_COMPARATIVES = ("impi", "impa", "impä", "immi", "imma", "immä",
                    "eja", "ejä", "mpi", "mpa", "mpä", "mmi", "mma",
                    "mmä")


def _fi_r1_r2(w: str) -> tuple[int, int]:
    """Standard Snowball R1/R2 over the Finnish vowel set."""
    n = len(w)

    def region_after(start: int) -> int:
        i = start
        while i < n and w[i] not in _FI_VOWELS:
            i += 1
        while i < n and w[i] in _FI_VOWELS:
            i += 1
        return i + 1 if i < n else n

    r1 = region_after(0)
    return r1, region_after(r1)


def _fi_longest_within(w: str, table, region: int) -> str | None:
    """Longest suffix from ``table`` lying entirely within the region
    (tables are ordered longest-first)."""
    for sfx in table:
        if w.endswith(sfx) and len(w) - len(sfx) >= region:
            return sfx
    return None


def finnish_stem(word: str) -> str:
    """Snowball Finnish stem of a lower-case word."""
    w = word.lower()
    r1, r2 = _fi_r1_r2(w)

    # Step 1: particles etc. — sti needs R2; the rest need a
    # preceding n, t or vowel (which may sit before R1)
    sfx = _fi_longest_within(w, _FI_PARTICLES, r1)
    if sfx is not None:
        k = len(w) - len(sfx)
        if sfx == "sti":
            if k >= r2:
                w = w[:k]
        elif k >= 1 and (w[k - 1] in "nt" or w[k - 1] in _FI_VOWELS):
            w = w[:k]

    # Step 2: possessives
    sfx = _fi_longest_within(w, _FI_POSSESSIVES, r1)
    if sfx is not None:
        k = len(w) - len(sfx)
        if sfx == "si":
            if not (k >= 1 and w[k - 1] == "k"):
                w = w[:k]
        elif sfx == "ni":
            w = w[:k]
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif sfx == "an":
            if w[:k].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                w = w[:k]
        elif sfx == "än":
            if w[:k].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = w[:k]
        elif sfx == "en":
            if w[:k].endswith(("lle", "ine")):
                w = w[:k]
        else:  # nsa nsä mme nne
            w = w[:k]

    # Step 3: case endings (sets the flag step 5 branches on)
    ended = False
    sfx = _fi_longest_within(w, _FI_CASES, r1)
    if sfx is not None:
        k = len(w) - len(sfx)
        if sfx in _FI_HXN:
            if k >= 1 and w[k - 1] == _FI_HXN[sfx]:
                w = w[:k]
                ended = True
        elif sfx in ("siin", "den", "tten"):
            # preceded by Vi (a vowel then i)
            if k >= 2 and w[k - 1] == "i" and w[k - 2] in _FI_VOWELS:
                w = w[:k]
                ended = True
        elif sfx == "seen":
            if w[k - 2:k] in _FI_LONG_VOWELS:
                w = w[:k]
                ended = True
        elif sfx in ("a", "ä"):
            # preceded by cv (consonant then vowel)
            if (k >= 2 and w[k - 2] not in _FI_VOWELS
                    and w[k - 1] in _FI_VOWELS):
                w = w[:k]
                ended = True
        elif sfx in ("tta", "ttä"):
            if k >= 1 and w[k - 1] == "e":
                w = w[:k]
                ended = True
        elif sfx == "n":
            w = w[:k]
            # …and a preceding long vowel or 'ie' loses its last letter
            if w[-2:] in _FI_LONG_VOWELS or w.endswith("ie"):
                w = w[:-1]
            ended = True
        else:  # ta tä ssa ssä sta stä lla llä lta ltä lle na nä ksi ine
            w = w[:k]
            ended = True

    # Step 4: other endings (comparatives/superlatives) — in R2; the
    # bare m-forms are blocked after 'po'
    sfx = _fi_longest_within(w, _FI_COMPARATIVES, r2)
    if sfx is not None:
        k = len(w) - len(sfx)
        if len(sfx) == 3 and sfx[0] == "m":
            if not w[:k].endswith("po"):
                w = w[:k]
        else:
            w = w[:k]

    # Step 5: plurals — i/j if a case ending was removed, else a
    # vowel-preceded t (whose removal re-exposes mma/imma in R2)
    if ended:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= r1
                and len(w) >= 2 and w[-2] in _FI_VOWELS):
            w = w[:-1]
            sfx = _fi_longest_within(w, ("imma", "mma"), r2)
            if sfx == "imma":
                w = w[: -4]
            elif sfx == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # Step 6: tidying — (a)…(e) each attempted in turn
    # (a) R1 ends with a long vowel → undouble it
    if len(w) - 2 >= r1 and w[-2:] in _FI_LONG_VOWELS:
        w = w[:-1]
    # (b) R1 ends consonant + one of a ä e i → drop the vowel
    if (len(w) - 2 >= r1 and w[-1] in "aäei"
            and w[-2] not in _FI_VOWELS):
        w = w[:-1]
    # (c) R1 ends oj / uj → drop the j
    if len(w) - 2 >= r1 and w[-2:] in ("oj", "uj"):
        w = w[:-1]
    # (d) R1 ends jo → drop the o
    if len(w) - 2 >= r1 and w[-2:] == "jo":
        w = w[:-1]
    # (e) the word ends with a double consonant followed by zero or
    # more vowels → undouble (eläkk → eläk, aatonaatto → aatonaato)
    i = len(w)
    while i > 0 and w[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and w[i - 1] == w[i - 2] and w[i - 1] not in _FI_VOWELS:
        w = w[: i - 1] + w[i:]

    return w


# -- Snowball Arabic --------------------------------------------------------
# Clean-room implementation of the published Snowball Arabic stemming
# algorithm (Assem Chelli, Abdelkrim Aries, Lakhdar Benzahia —
# snowballstem.org; shipped with Snowball 2.x, and through nltk's
# SnowballStemmer the reference accepts it, reference
# tokenizer.py:24-33). Behavior is pinned 1:1 against an independent
# compiled build of the official sources (PostgreSQL's
# dict_snowball.so, the same oracle as tests/fixtures/snowball/) —
# 20k+ adversarial fuzz words with zero divergence, see
# tools/gen_snowball_fixtures.py and tests/test_arabic_stemmer.py.
#
# Structure: Checks1 (definite-article detection on the RAW token,
# before normalization) → Normalize_pre (diacritics/tatweel removal,
# lam-alef ligature expansion) → suffix steps (verb chain, else noun
# chain, else final alef-maksura fold) → prefix steps → Normalize_post
# (final hamza carrier → ء, then the أ/إ/آ→ا, ؤ→و, ئ→ي sweep).
# Faithfulness notes, all oracle-verified:
# - among() takes the LONGEST matching entry; if its length test
#   fails, the whole step fails — no retry with a shorter entry.
# - string edits are never rolled back when a later conjunct fails
#   (snowball semantics), so e.g. Suffix_Noun_Step1b's ن deletion
#   persists even when no Step2 suffix follows.
# - the prefix routines share a cursor: Step1's substitution leaves it
#   at offset 1 and Step3_Verb's at +1 more, so later steps match at
#   that offset, not at the word start (سيست… → ياست…, but ستست… →
#   تست… because the surviving تست sits before the cursor).

_AR_DIAC = frozenset("ًٌٍَُِّْ")
_AR_TATWEEL = "ـ"
_AR_LIG = {
    "ﻻ": "لا", "ﻼ": "لا",
    "ﻷ": "لأ", "ﻸ": "لأ",
    "ﻹ": "لإ", "ﻺ": "لإ",
    "ﻵ": "لآ", "ﻶ": "لآ",
}

# (suffix, min current length); longest match wins (see notes above)
_AR_VS1 = (("هما", 6), ("كما", 6), ("كمو", 6),
           ("ني", 5), ("نا", 5), ("ها", 5), ("هم", 5), ("هن", 5),
           ("كم", 5), ("كن", 5),
           ("ه", 4), ("ك", 4))
_AR_VS2A = (("تما", 6), ("ان", 6), ("ون", 6), ("ين", 6),
            ("نا", 5), ("تا", 5), ("تن", 5),
            ("ا", 4), ("ت", 4), ("ن", 4), ("ي", 4))
_AR_VS2B = (("وا", 5), ("تم", 5))
_AR_VS2C = (("تمو", 6), ("و", 4))
_AR_NS1A = (("كما", 6), ("هما", 6),
            ("نا", 5), ("كم", 5), ("ها", 5), ("هن", 5), ("هم", 5),
            ("ي", 4), ("ك", 4), ("ه", 4))
_AR_NS1B = (("ن", 6),)
_AR_NS2A = (("ا", 5), ("ي", 5), ("و", 5))
_AR_NS2B = (("ات", 5),)
_AR_NS2C1 = (("ت", 4),)
_AR_NS2C2 = (("ة", 4),)
_AR_NS3 = (("ي", 3),)

_AR_POST = str.maketrans({"آ": "ا", "أ": "ا", "إ": "ا",
                          "ؤ": "و", "ئ": "ي"})


def _ar_among(w: str, entries) -> tuple[str, bool]:
    best = None
    for sfx, minlen in entries:
        if w.endswith(sfx) and (best is None or len(sfx) > len(best[0])):
            best = (sfx, minlen)
    if best is None or len(w) < best[1]:
        return w, False
    return w[: len(w) - len(best[0])], True


def _ar_suffix_verb(w: str) -> tuple[str, bool]:
    w1, m = _ar_among(w, _AR_VS1)
    if m:
        while m:                       # Step1 repeats while it matches
            w, (w1, m) = w1, _ar_among(w1, _AR_VS1)
        w2, m2 = _ar_among(w, _AR_VS2A)
        if not m2:
            w2, m2 = _ar_among(w, _AR_VS2C)
        return (w2 if m2 else w), True
    w1, m = _ar_among(w, _AR_VS2B)
    if m:
        return w1, True
    return _ar_among(w, _AR_VS2A)


def _ar_suffix_noun(w: str, defined: bool) -> tuple[str, bool]:
    w1, m = _ar_among(w, _AR_NS2C2)
    if m:
        w = w1
    else:
        took_1a = False
        if not defined:
            w1, m = _ar_among(w, _AR_NS1A)
            if m:
                w, took_1a = w1, True
                for tbl in (_AR_NS2A, _AR_NS2B, _AR_NS2C1):
                    w1, m2 = _ar_among(w, tbl)
                    if m2:
                        w = w1
                        break
        if not took_1a:
            done = False
            w1, m = _ar_among(w, _AR_NS1B)
            if m:
                w = w1     # persists even if no Step2 suffix follows
                for tbl in (_AR_NS2A, _AR_NS2B, _AR_NS2C1):
                    w1, m2 = _ar_among(w, tbl)
                    if m2:
                        w, done = w1, True
                        break
            if not done:
                if not defined:
                    w1, m = _ar_among(w, _AR_NS2A)
                    if m:
                        w, done = w1, True
                if not done:
                    w1, m = _ar_among(w, _AR_NS2B)
                    if m:
                        w = w1
    # Suffix_Noun_Step3 decides whether the noun branch succeeded
    w1, m = _ar_among(w, _AR_NS3)
    if m:
        return w1, True
    return w, False


def _ar_prefixes(w: str, is_verb: bool) -> str:
    c = 0
    # Prefix_Step1 (try): hamza'd double-alef starts collapse
    if len(w) > 3:
        for pre, repl in (("أأ", "أ"), ("أآ", "آ"), ("أؤ", "أ"),
                          ("أإ", "إ"), ("أا", "ا")):
            if w.startswith(pre):
                w = repl + w[2:]
                c = 1
                break
    # Prefix_Step2 (try): conjunction و / ف unless followed by ا
    if len(w) > 3 and len(w) > c + 1 and w[c] in "وف" and w[c + 1] != "ا":
        w = w[:c] + w[c + 1:]
    n = len(w)
    t = w[c:]
    # Prefix_Step3a_Noun or Prefix_Step3b_Noun or the verb chain
    if t.startswith(("ال", "لل")):
        return w[:c] + t[2:] if n > 4 else w
    if t.startswith(("بال", "كال")):
        return w[:c] + t[3:] if n > 5 else w
    if t.startswith(("با", "كا")):           # matched — always fails
        pass
    elif t[:1] == "ب" or t.startswith("كك"):
        # ب strips before anything but ا; bare ك never strips — only a
        # doubled كك loses one
        return w[:c] + t[1:] if n > 3 else w
    elif t[:1] == "ك":
        pass                                 # matched — always fails
    elif is_verb:
        # Prefix_Step3_Verb (try) then Prefix_Step4_Verb, sequential;
        # Step3's substitution advances the shared cursor (see notes)
        if len(w) > 4 and t.startswith(("سي", "ست", "سن", "سأ")):
            w = w[:c] + t[1:]
            c += 1
            t = w[c:]
        if len(w) > 4 and t.startswith(("يست", "نست", "تست", "أست")):
            w = w[:c] + "ا" + t[1:]
    return w


def arabic_stem(word: str) -> str:
    """Snowball Arabic stem of a token."""
    w = word
    is_verb, is_defined = True, False
    # Checks1 — on the RAW token, before Normalize_pre
    if w.startswith(("بال", "كال")):
        if len(w) > 4:
            is_verb, is_defined = False, True
    elif w.startswith(("ال", "لل")):
        if len(w) > 3:
            is_verb, is_defined = False, True
    # Normalize_pre
    w = "".join(_AR_LIG.get(ch, ch) for ch in w
                if ch not in _AR_DIAC and ch != _AR_TATWEEL)
    # Suffixes: verb chain, else noun chain, else alef-maksura fold
    handled = False
    if is_verb:
        w, handled = _ar_suffix_verb(w)
    if not handled:
        w, handled = _ar_suffix_noun(w, is_defined)
    if not handled and w.endswith("ى"):
        w = w[:-1] + "ي"
    # Prefixes
    w = _ar_prefixes(w, is_verb)
    # Normalize_post: final hamza carrier → ء, then the global sweep
    if w and w[-1] in "آأإؤئ":
        w = w[:-1] + "ء"
    w = w.translate(_AR_POST)
    # a token of nothing but diacritics/tatweel empties out in
    # Normalize_pre — surface the original token instead
    return w if w else word


STEMMERS = {
    "english": stem,        # Porter2 (Snowball English)
    "porter": porter_stem,  # original Porter (1980)
    "german": german_stem,  # Snowball German
    "spanish": spanish_stem,  # Snowball Spanish
    "french": french_stem,  # Snowball French
    "italian": italian_stem,  # Snowball Italian
    "portuguese": portuguese_stem,  # Snowball Portuguese
    "dutch": dutch_stem,    # Snowball Dutch
    "russian": russian_stem,  # Snowball Russian
    "swedish": swedish_stem,  # Snowball Swedish
    "danish": danish_stem,  # Snowball Danish
    "norwegian": norwegian_stem,  # Snowball Norwegian
    "romanian": romanian_stem,  # Snowball Romanian
    "hungarian": hungarian_stem,  # Snowball Hungarian
    "finnish": finnish_stem,  # Snowball Finnish
    "arabic": arabic_stem,  # Snowball Arabic
}
