"""English Porter2-style stemmer as an Arrow-batched pandas UDF
(SURVEY.md §2.4 T1).

Behavioral parity with the reference's hand-written stemmer
(pkg/textanalyzer/stemmer_english.go:106-330), validated against the
reference's own 70-vector golden suite
(stemmer_english_test.go — tests/test_stemmer_golden.py). The
reference deviates from official Snowball Porter2 in documented ways
and parity means matching IT, not Snowball:

  * no exceptional-form shortcut for bare "sky" (only "skis"/"skies"
    are in its exception table), so sky -> ski via step 1c;
  * step 1a maps "ies" -> "i" unconditionally (official Porter2 keeps
    "ie" after a single letter: ties -> tie there, ti here);
  * R1/R2 are computed ONCE on the original word and the same indices
    gate every later step even as the string shrinks;
  * suffix lists are scanned in a fixed order and a suffix that
    matches but fails its region test does NOT stop the scan (official
    Porter2 commits to the longest match).

Stemming is inherently procedural, so this is one of the few places
the engine drops to Python — but vectorized: one pandas UDF call per
Arrow batch, applied AFTER tokenization/stopword removal so it only
sees the (much smaller) token stream, and OFF the default path exactly
like the reference (stemming only happens when an index is created
with a language).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_V = set("aeiou")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl", "news": "news",
    "howe": "howe", "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
    "andes": "andes",
}
_EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _is_vowel(s: str, i: int) -> bool:
    if i < 0 or i >= len(s):
        return False
    c = s[i]
    if c in _V:
        return True
    if c == "y":
        # y after a non-vowel acts as a vowel; word-initial y (marked
        # 'Y') and y after a vowel are consonants
        return i != 0 and s[i - 1] not in _V
    return False


def _regions(s: str) -> tuple[int, int]:
    n = len(s)
    r1 = r2 = n
    for i in range(1, n):
        if not _is_vowel(s, i) and _is_vowel(s, i - 1):
            r1 = i + 1
            break
    for i in range(r1 + 1, n):
        if not _is_vowel(s, i) and _is_vowel(s, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(s: str) -> bool:
    n = len(s)
    if n >= 3 and (not _is_vowel(s, n - 3)) and _is_vowel(s, n - 2) \
            and not _is_vowel(s, n - 1) and s[-1] not in "wxy":
        return True
    return n == 2 and _is_vowel(s, 0) and not _is_vowel(s, 1)


def _replace_in_region(s: str, region: int, old: str, new: str):
    if s.endswith(old) and len(s) - len(old) >= region:
        return s[: len(s) - len(old)] + new, True
    return s, False


def _has_vowel(s: str) -> bool:
    return any(_is_vowel(s, i) for i in range(len(s)))


def stem_word(word: str) -> str:
    """Stem one lowercase token with the reference's ruleset."""
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    s = word[1:] if word.startswith("'") else word
    if s[:1] == "y":
        s = "Y" + s[1:]
    r1, r2 = _regions(s)

    # step 0: possessives
    for suf in ("'s'", "'s", "'"):
        if s.endswith(suf):
            s = s[: -len(suf)]
            break

    # step 1a: plurals
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith("ies"):
        s = s[:-2]
    elif s.endswith("s") and not s.endswith("ss"):
        if len(s) > 2 and _has_vowel(s[:-1]):
            s = s[:-1]

    if s in _EXCEPTIONS2:
        return s

    # step 1b: -eed(ly) in R1 -> ee; -ed(ly)/-ing(ly) dropped when the
    # stem has a vowel, with at/bl/iz + e, undoubling, short-word + e
    if s.endswith("eed") or s.endswith("eedly"):
        for old in ("eed", "eedly"):
            out, ok = _replace_in_region(s, r1, old, "ee")
            if ok:
                s = out
                break
    else:
        stem = None
        for old in ("edly", "ed"):
            if s.endswith(old):
                stem = s[: -len(old)]
                break
        if stem is None:
            for old in ("ingly", "ing"):
                if s.endswith(old):
                    stem = s[: -len(old)]
                    break
        if stem is not None and _has_vowel(stem):
            s = stem
            if s.endswith(("at", "bl", "iz")):
                s += "e"
            elif len(s) > 1 and s[-1] == s[-2]:
                if s[-1] not in "lsz":
                    s = s[:-1]
            else:
                r1_stem, _ = _regions(s)
                if _ends_short_syllable(s) and r1_stem == len(s):
                    s += "e"

    # step 1c: final y/Y after a consonant -> i
    if len(s) > 2 and s[-1] in "yY" and not _is_vowel(s, len(s) - 2):
        s = s[:-1] + "i"

    # step 2 (R1): first suffix that matches AND is in-region wins
    for old, new in _STEP2:
        out, ok = _replace_in_region(s, r1, old, new)
        if ok:
            s = out
            break

    # step 3 (R1; 'ative' needs R2)
    for old, new in _STEP3:
        out, ok = _replace_in_region(s, r2 if old == "ative" else r1, old, new)
        if ok:
            s = out
            break

    # step 4 (R2): -ion only after s/t, then the plain list
    handled = False
    if s.endswith("ion") and len(s) - 3 >= r2 and s[:-3].endswith(("s", "t")):
        s = s[:-3]
        handled = True
    if not handled:
        for old in _STEP4:
            out, ok = _replace_in_region(s, r2, old, "")
            if ok:
                s = out
                break

    # step 5: final -e unless the stem is itself a bare short syllable;
    # -ll -> -l past R1
    if s.endswith("e"):
        stem = s[:-1]
        if len(stem) >= r1:
            r1_stem, _ = _regions(stem)
            if not _ends_short_syllable(stem) or r1_stem != len(stem):
                s = stem
    if s.endswith("ll") and len(s) - 2 >= r1:
        s = s[:-1]

    return s.lower()


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens(toks: pd.Series) -> pd.Series:
    """Vectorized token-array stemmer (applied per Arrow batch)."""
    return toks.apply(lambda arr: [stem_word(t) for t in arr] if arr is not None else None)
