"""Porter stemming algorithm (classic 1980 algorithm, "Release 4" semantics).

This is a from-scratch Python implementation of M. F. Porter's original
stemming algorithm ("An algorithm for suffix stripping", Program 14(3),
1980), matching the behavior of the widely-distributed public-domain
reference implementations ("Release 4" of the Java/C versions), which is
what the reference engine applies per token
(ref: Search-Engine/src/main/java/com/example/Search/Engine/QP/Stemmer.java:27-359,
invoked at Indexer/Tokenizer.java:109-112 and QP/QP.java:403-406).

Includes the two documented departures of the distributed code from the
published paper: step-2 maps ``bli -> ble`` (paper: ``abli -> able``) and
adds ``logi -> log``.

The module-level :func:`stem` is memoized — corpus vocabulary is tiny
relative to token count, so Arrow-batch stemming amortizes to a dict hit
per token.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem_part: str) -> int:
    """Number of VC sequences in ``stem_part`` (the m of the paper)."""
    n = len(stem_part)
    i = 0
    # skip leading consonants
    while i < n and _is_cons(stem_part, i):
        i += 1
    m = 0
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem_part, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem_part, i):
            i += 1
    return m


def _has_vowel(stem_part: str) -> bool:
    return any(not _is_cons(stem_part, i) for i in range(len(stem_part)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """consonant-vowel-consonant ending, final cons not w/x/y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_cons(word, n - 1)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 3)
        and word[n - 1] not in "wxy"
    )


def _step1ab(w: str) -> str:
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif not w.endswith("ss"):
            w = w[:-1]
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    return w


# (suffix -> replacement), applied when m(stem) > 0; first match by suffix
# wins within the group selected by the penultimate character.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"),
    ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"),
    ("bli", "ble"),            # departure from the paper (abli -> able)
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),           # departure: added in the distributed code
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _map_suffix(w: str, table) -> str:
    for suf, rep in table:
        if w.endswith(suf):
            stem_part = w[: -len(suf)]
            if _measure(stem_part) > 0:
                return stem_part + rep
            return w
    return w


def _step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem_part = w[: -len(suf)]
            if suf == "ion" and not stem_part.endswith(("s", "t")):
                continue
            if _measure(stem_part) > 1:
                return stem_part
            return w
    return w


def _step5(w: str) -> str:
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


@lru_cache(maxsize=1 << 20)
def stem(word: str) -> str:
    """Stem one lowercase word. Words of length <= 2 pass through
    unchanged (as in the distributed implementations)."""
    if len(word) <= 2:
        return word
    w = _step1ab(word)
    w = _step1c(w)
    w = _map_suffix(w, _STEP2)
    w = _map_suffix(w, _STEP3)
    w = _step4(w)
    w = _step5(w)
    return w


def stem_tokens(tokens) -> list[str]:
    """Stem a sequence of tokens (cache-amortized)."""
    return [stem(t) for t in tokens]
