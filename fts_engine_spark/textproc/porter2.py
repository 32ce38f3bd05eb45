"""Vendored pure-Python Porter2 (Snowball English) stemmer.

Implements the published Snowball "English (Porter2)" algorithm, matching the
behavior of ``github.com/kljensen/snowball/english`` used by the reference's
``EnglishStemFilter`` (``/root/reference/pkg/textproc/pipeline.go:140-159``,
``go.mod:8``). ``stem(word, stem_stopwords=False)`` mirrors
``snowballeng.Stem(word, false)``: lowercase + trim first, stopwords returned
unstemmed when ``stem_stopwords`` is false (``pipeline.go:156``).

Written from the public algorithm description (snowballstem.org); no code was
copied from any implementation.
"""

from __future__ import annotations

from functools import lru_cache

from .gocompat import go_lower
from .stopwords import ENGLISH_STOPWORDS

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_VALID = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
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
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

# Step 2 suffix -> replacement (None replacement means conditional logic below)
_STEP2_SUFFIXES = [
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
    ("ogi", None),  # -> og, only when preceded by 'l'
    ("li", None),  # -> delete, only when preceded by valid li-ending
]

_STEP3_SUFFIXES = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", None),  # delete, only if in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
]

_STEP4_SUFFIXES = [
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _compute_r1(word: str) -> int:
    """R1 = region after the first non-vowel following a vowel, with the
    special prefixes gener-, commun-, arsen-."""
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            return len(prefix)
    for i in range(len(word) - 1):
        if _is_vowel(word, i) and not _is_vowel(word, i + 1):
            return i + 2
    return len(word)


def _compute_r2(word: str, r1: int) -> int:
    for i in range(r1, len(word) - 1):
        if _is_vowel(word, i) and not _is_vowel(word, i + 1):
            return i + 2
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable:
    (a) vowel + non-vowel(not w/x/Y) preceded by a non-vowel, or
    (b) vowel at position 0 followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        c1, c2, c3 = word[-3], word[-2], word[-1]
        return (
            c2 in _VOWELS
            and c3 not in _VOWELS
            and c3 not in "wxY"
            and c1 not in _VOWELS
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(word: str, end: int) -> bool:
    """Any vowel in word[:end]?"""
    for i in range(end):
        if _is_vowel(word, i):
            return True
    return False


def _porter2(word: str) -> str:
    if len(word) <= 2:
        return word

    word = word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    if word.startswith("'"):
        word = word[1:]

    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y: y at start or after a vowel -> Y
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1 = _compute_r1(word)
    r2 = _compute_r2(word, r1)

    # --- Step 0: strip apostrophe suffixes ('s', 's, ')
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # --- Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        # delete if the preceding part contains a vowel NOT immediately
        # before the s
        if _has_vowel(word, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # --- Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _has_vowel(stem_part, len(stem_part)):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # --- Step 1c: y/Y -> i when preceded by a non-vowel that's not first char
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # --- Step 2 (suffix must be in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_VALID:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 3 (suffix must be in R1; 'ative' additionally in R2)
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 4 (suffix must be in R2)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # --- Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


@lru_cache(maxsize=1 << 18)
def stem(word: str, stem_stopwords: bool = False) -> str:
    """Mirror ``snowballeng.Stem(word, stemStopWords)``."""
    w = go_lower(word.strip())
    if not stem_stopwords and w in ENGLISH_STOPWORDS:
        return w
    return _porter2(w)
