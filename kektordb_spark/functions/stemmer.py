"""English suffix-stripping stemmer as an Arrow-batched pandas UDF
(SURVEY.md §2.4 T1).

The reference ships hand-written Porter2-style stemmers
(pkg/textanalyzer/stemmer_english.go:106-330); stemming is inherently
procedural, so this is one of the few places the engine drops to
Python — but vectorized: one pandas UDF call per Arrow batch, applied
AFTER tokenization/stopword removal so it only sees the (much smaller)
token stream. It is OFF the default path, exactly like the reference
(stemming only happens when an index is created with a language).

The algorithm is the classic public Porter stemming scheme (Porter,
1980, "An algorithm for suffix stripping") in a compact step-1/2/3
form — deterministic, pure-Python, no external models.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWELS = set("aeiou")


def _has_vowel(word: str) -> bool:
    return any(c in _VOWELS for c in word)


def _measure(word: str) -> int:
    """Porter's m: number of VC sequences."""
    m, prev_v = 0, False
    for c in word:
        v = c in _VOWELS
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def stem_word(word: str) -> str:
    """Compact Porter-style stem: plurals, -ed/-ing, -y, common
    derivational suffixes. Deterministic; lowercase-in lowercase-out."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a: plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s") and len(w) > 3:
        w = w[:-1]
    # step 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _fix_stub(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _fix_stub(w)
    # step 1c: -y -> -i after a vowel-containing stem
    if w.endswith("y") and _has_vowel(w[:-1]) and len(w) > 2:
        w = w[:-1] + "i"
    # step 2/3: common derivational endings (m>0 condition)
    for suf, rep in (
        ("ational", "ate"), ("ization", "ize"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("entli", "ent"), ("ousli", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("ation", "ate"),
        ("alism", "al"), ("ator", "ate"), ("izer", "ize"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("alli", "al"), ("ment", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    return w


def _fix_stub(w: str) -> str:
    """Post -ed/-ing cleanup: at->ate, doubled consonant, -e restore."""
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if (
        len(w) >= 2 and w[-1] == w[-2]
        and w[-1] not in _VOWELS and w[-1] not in "lsz"
    ):
        return w[:-1]
    return w


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens(toks: pd.Series) -> pd.Series:
    """Vectorized token-array stemmer (applied per Arrow batch)."""
    return toks.apply(lambda arr: [stem_word(t) for t in arr] if arr is not None else None)
