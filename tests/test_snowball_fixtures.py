"""Independent Snowball conformance fixtures.

``tests/fixtures/snowball/<lang>.tsv`` holds word→stem pairs produced
by PostgreSQL's compiled official Snowball dictionaries
(``dict_snowball.so``; see tools/gen_snowball_fixtures.py) — a second
implementation that shares no code with
``searchengine_ray/text/stemmer.py``. This closes the round-4 verdict
circularity finding: the per-language search oracles stem with the
code under test, so THESE pairs are the evidence that the stemmers
themselves are right — expectations here are read from the committed
files, never computed.

Known divergences between offline implementations are excluded at
generation time and documented in the generator (currently: hungarian
'fát'; german's newer-spec 'syst' exception is not applied — both
independent implementations predate it)."""

from pathlib import Path

import pytest

from searchengine_ray.text import stemmer

FIXTURES = Path(__file__).parent / "fixtures" / "snowball"
LANGS = sorted(p.stem for p in FIXTURES.glob("*.tsv"))


def _pairs(lang: str) -> list[tuple[str, str]]:
    out = []
    for line in (FIXTURES / f"{lang}.tsv").read_text(
            encoding="utf-8").splitlines():
        if line.startswith("#") or not line.strip():
            continue
        w, s = line.split("\t")
        out.append((w, s))
    return out


@pytest.mark.parametrize("lang", LANGS)
def test_stemmer_matches_official_snowball(lang):
    fn = stemmer.stem if lang == "english" else getattr(
        stemmer, f"{lang}_stem")
    pairs = _pairs(lang)
    assert len(pairs) >= 75, f"suspiciously small fixture for {lang}"
    bad = [(w, want, fn(w)) for w, want in pairs if fn(w) != want]
    assert not bad, f"{lang}: {len(bad)} divergences, e.g. {bad[:5]}"
