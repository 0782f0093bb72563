"""Original Porter stemming algorithm (Porter, 1980; public domain).

The reference delegates analysis to Lucene's ``EnglishAnalyzer`` (PorterStemFilter)
via Anserini's DefaultLuceneDocumentGenerator — see
/root/reference/src/searcher/lucene/index.rs:22-23,60-61 and
/root/reference/src/searcher/lucene/searcher.rs:86-90. Lucene's PorterStemmer.java
implements the original paper algorithm, which this module re-implements natively
in Python (no code taken from Lucene or the reference).

Per the classic implementations, strings of length <= 2 are returned unchanged.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] decomposition."""
    n = len(stem)
    i = 0
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while True:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
        if i >= n:
            return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1)


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[-1] not in "wxy"
    )


# (suffix, replacement) pairs; longest suffix wins within a step, and once a
# suffix matches the step ends whether or not the measure condition passes.
# Includes the two Lucene/tartarus DEPARTURE rules vs the 1980 paper (both
# marked "DEPARTURE" in Lucene's PorterStemmer.java, which the reference runs
# via Anserini): 'bli'->'ble' replaces the paper's 'abli'->'able', and
# 'logi'->'log' is added — so e.g. technology/technological co-stem to
# "technolog" exactly as the reference's analysis chain produces.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)

_STEP2_SORTED = sorted(_STEP2, key=lambda p: -len(p[0]))
_STEP3_SORTED = sorted(_STEP3, key=lambda p: -len(p[0]))
_STEP4_SORTED = sorted(_STEP4, key=len, reverse=True)


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        # (m>0) EED -> EE; a failed condition still consumes the step.
        return w[:-1] if _measure(w[:-3]) > 0 else w
    removed = False
    if w.endswith("ed"):
        stem = w[:-2]
        if _has_vowel(stem):
            w, removed = stem, True
    elif w.endswith("ing"):
        stem = w[:-3]
        if _has_vowel(stem):
            w, removed = stem, True
    if removed:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_cons(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _ends_cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


def _step2(w: str) -> str:
    for suf, rep in _STEP2_SORTED:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            return stem + rep if _measure(stem) > 0 else w
    return w


def _step3(w: str) -> str:
    for suf, rep in _STEP3_SORTED:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            return stem + rep if _measure(stem) > 0 else w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4_SORTED:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    return w
                return stem
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if w.endswith("ll") and _measure(w) > 1:
        return w[:-1]
    return w


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:
    """Stem one lowercase token with the original Porter algorithm."""
    if len(word) <= 2:
        return word
    w = _step1a(word)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w
