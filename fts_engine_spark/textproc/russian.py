"""Vendored pure-Python Snowball Russian stemmer.

Implements the published Snowball "Russian" algorithm, matching
``github.com/kljensen/snowball/russian`` used by the reference's
``RussianStemFilter`` (``/root/reference/pkg/textproc/pipeline.go:185-204``).
Written from the public algorithm description (snowballstem.org).
"""

from __future__ import annotations

from functools import lru_cache

from .gocompat import go_lower
from .stopwords import RUSSIAN_STOPWORDS

_VOWELS = frozenset("аеиоуыэюя")

# Ending groups. "_AJ" groups require the char immediately preceding the
# ending to be а or я (the а/я itself is NOT removed).
_PERFECTIVE_GERUND_AJ = ("вшись", "вши", "в")
_PERFECTIVE_GERUND = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_REFLEXIVE = ("ся", "сь")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом",
    "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_AJ = ("ем", "нн", "вш", "ющ", "щ")
_PARTICIPLE = ("ивш", "ывш", "ующ")
_VERB_AJ = (
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_VERB = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено", "ует",
    "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
    "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _find_regions(word: str) -> tuple[int, int]:
    """Return (rv, r2) as absolute start offsets.

    RV: after the first vowel. R1: after the first non-vowel following a
    vowel; R2: same rule applied within R1.
    """
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break
    return rv, r2


def _strip(word: str, endings: tuple[str, ...], rv: int, require_aj: bool = False) -> str | None:
    """Remove the longest matching ending found entirely within RV.

    ``require_aj``: the char immediately before the ending must be а/я
    (checked inside RV as well, per the Snowball definition of the groups).
    """
    for end in endings:
        if word.endswith(end) and len(word) - len(end) >= rv:
            if require_aj:
                # The concrete Snowball pattern is а/я + ending, all in RV.
                i = len(word) - len(end) - 1
                if i < rv or word[i] not in "ая":
                    continue
            return word[: -len(end)]
    return None


def _russian_stem(word: str) -> str:
    word = word.replace("ё", "е")
    rv, r2 = _find_regions(word)

    # --- Step 1
    res = _strip(word, _PERFECTIVE_GERUND, rv) or _strip(
        word, _PERFECTIVE_GERUND_AJ, rv, require_aj=True
    )
    if res is not None:
        word = res
    else:
        r = _strip(word, _REFLEXIVE, rv)
        if r is not None:
            word = r
        res = _strip(word, _ADJECTIVE, rv)
        if res is not None:
            word = res
            res = _strip(word, _PARTICIPLE, rv) or _strip(
                word, _PARTICIPLE_AJ, rv, require_aj=True
            )
            if res is not None:
                word = res
        else:
            res = _strip(word, _VERB, rv) or _strip(word, _VERB_AJ, rv, require_aj=True)
            if res is not None:
                word = res
            else:
                res = _strip(word, _NOUN, rv)
                if res is not None:
                    word = res

    # --- Step 2: remove trailing и (in RV)
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # --- Step 3: DERIVATIONAL in R2
    for end in _DERIVATIONAL:
        if word.endswith(end) and len(word) - len(end) >= r2:
            word = word[: -len(end)]
            break

    # --- Step 4
    if word.endswith("нн") and len(word) - 2 >= rv:
        word = word[:-1]
    else:
        res = _strip(word, _SUPERLATIVE, rv)
        if res is not None:
            word = res
            if word.endswith("нн") and len(word) - 2 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]

    return word


@lru_cache(maxsize=1 << 18)
def stem(word: str, stem_stopwords: bool = False) -> str:
    """Mirror ``snowballrus.Stem(word, stemStopWords)``."""
    w = go_lower(word.strip())
    if not stem_stopwords and w in RUSSIAN_STOPWORDS:
        return w
    return _russian_stem(w)
