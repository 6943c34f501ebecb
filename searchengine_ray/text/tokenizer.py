"""Tokenizer with the reference engine's exact semantics.

Mirrors reference ``src/models/tokenizer.py:41-72`` (verified behaviors,
SURVEY.md §2.2 M1-M6):

1. Every character in ASCII ``string.punctuation`` (32 chars, including
   ``'``, ``_``, ``-``) is replaced by a space. Unicode punctuation is
   KEPT (reference ``tokenizer.py:49``).
2. Full Unicode lowercasing (``str.lower``, ``tokenizer.py:50``).
3. ``re.findall(r'\\S+|\\t|\\n', lowered)`` — note ``\\t``/``\\n`` survive
   step 1 (not in ``string.punctuation``) and become literal one-char
   tokens (``tokenizer.py:51``).
4. Min-length filter ``len(tok) >= min_token_length``; skipped when the
   setting is None (``tokenizer.py:53-54``).
5. Stop-word filter, applied after lowering and before stemming; stemmed
   output is NOT re-filtered (``tokenizer.py:56-57``).
6. Porter2 stem with an unbounded per-instance memo cache
   (``tokenizer.py:59-70``).

Token positions used by positional postings are indices in the FINAL
filtered+stemmed list (reference ``index.py:173-180``).

The implementation is its own design: a translate-table fast path for
step 1 (semantically identical to the reference's per-char map) and a
module-level compiled regex.
"""

from __future__ import annotations

import re
import string
from pathlib import Path

from searchengine_ray.text.stemmer import CachedStemmer

_PUNCT_TABLE = str.maketrans({c: " " for c in string.punctuation})
_TOKEN_RE = re.compile(r"\S+|\t|\n")

# A standard English stop-word list (public knowledge; same role as the
# reference's ``stop_words.txt`` config input, loaded with identical
# ``set(read().split('\n'))`` semantics — reference ``tokenizer.py:35-39``).
DEFAULT_STOP_WORDS = frozenset(
    """a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up very was wasn't we
we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves""".split()
)


def load_stop_words(path: str | Path | None) -> frozenset[str] | None:
    """Load a stop-word file with the reference's exact semantics:
    ``set(file.read().split('\n'))`` (reference ``tokenizer.py:35-39``)."""
    if path is None:
        return None
    with open(Path(path)) as f:
        return frozenset(f.read().split("\n"))


# Languages with an implemented stemmer. The reference accepts any
# language name and delegates to ``SnowballStemmer(language)``
# (reference ``tokenizer.py:24-33,59-70``); implemented here:
# 'english' (Snowball Porter2), 'porter' (the original 1980 Porter
# algorithm — also a SnowballStemmer language option), 'german',
# 'spanish', 'french', 'italian', 'portuguese', 'dutch', 'russian',
# 'swedish', 'danish', 'norwegian', 'romanian', 'hungarian' and
# 'finnish' (each Snowball, clean-room from the public spec). Any
# other language FAILS LOUDLY instead of silently stemming with the
# wrong algorithm.
SUPPORTED_LANGUAGES = frozenset(
    {"english", "porter", "german", "spanish", "french", "italian",
     "portuguese", "dutch", "russian", "swedish", "danish", "norwegian",
     "romanian", "hungarian", "finnish", "arabic"}
)


class Tokenizer:
    """Stateful tokenizer: holds the stop-word set and the stemmer memo
    cache. Build stages instantiate one per actor/worker (``__init__``
    once, then per-batch calls) — SURVEY.md §2.3 ST1."""

    def __init__(
        self,
        min_token_length: int | None = None,
        stop_words: frozenset[str] | None = None,
        language: str | None = "english",
    ) -> None:
        if language is not None and language not in SUPPORTED_LANGUAGES:
            raise ValueError(
                f"unsupported stemmer language {language!r}; implemented: "
                f"{sorted(SUPPORTED_LANGUAGES)} (the reference delegates to "
                "nltk SnowballStemmer — add a stemmer to text/stemmer.py to "
                "extend)"
            )
        self.min_token_length = min_token_length
        self.stop_words = stop_words
        self.language = language
        self._stemmer = CachedStemmer(language) if language is not None \
            else None

    def tokenize(self, text: str) -> list[str]:
        lowered = text.translate(_PUNCT_TABLE).lower()
        tokens = _TOKEN_RE.findall(lowered)

        min_len = self.min_token_length
        if min_len is not None:
            tokens = [t for t in tokens if len(t) >= min_len]

        stop = self.stop_words
        if stop is not None:
            tokens = [t for t in tokens if t not in stop]

        stemmer = self._stemmer
        if stemmer is not None:
            s = stemmer.stem
            tokens = [s(t) for t in tokens]

        return tokens

    def config(self) -> dict:
        """Manifest-serializable tokenizer config (reference records the
        equivalent in the index header — ``indexer.py:29-35``)."""
        return {
            "min_token_length": self.min_token_length,
            "n_stop_words": len(self.stop_words) if self.stop_words else 0,
            "language": self.language,
            "supported_languages": sorted(SUPPORTED_LANGUAGES),
        }
