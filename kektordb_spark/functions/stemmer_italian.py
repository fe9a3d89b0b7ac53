"""Italian Snowball-style stemmer as an Arrow-batched pandas UDF
(SURVEY.md §2.4 T1, the ``language:"italian"`` analyzer).

Behavioral parity with the reference's hand-written Italian stemmer
(pkg/textanalyzer/stemmer_italian.go:91-225) and its stopword filter
(analyzer.go:44-80). Parity means matching the reference's
IMPLEMENTATION, not official Snowball: the reference's own golden
suite (stemmer_italian_test.go) is ``t.Skip``-ped because the
implementation deviates from Snowball in several spots, and this port
reproduces those deviations on purpose:

  * suffix/region arithmetic is BYTE-indexed against RUNE-indexed
    regions (Go ``len(s)`` vs ``[]rune`` positions) — identical for
    ASCII words, deliberately replicated via byte-level ops here so
    accented words (only a/e/i/o/u-grave are normalized; é ó ú etc.
    survive) behave exactly like the Go code;
  * step-3 removes a bare final vowel BEFORE the chi/ghi
    normalization can see it, so "banchi" -> "banch" (Snowball:
    "banc") — the chi/ghi branch is unreachable, replicated as-is;
  * suffix lists scan in the reference's fixed order, first match
    wins (no longest-match rule), and accented entries that the
    accent normalization makes unmatchable stay in the tables;
  * step 2 runs only when step 1 changed nothing; regions are
    computed once up front and never recomputed as the string
    shrinks.

Validated by tests/test_stemmer_golden.py: the subset of the
reference's (skipped) test vectors its implementation actually
satisfies is asserted verbatim from the reference's own test file;
the divergent cases are pinned with the implementation's outputs and
documented there.

Like the English stemmer, this is a pandas UDF applied after
tokenization + stopword removal, OFF the default path (the reference
stems only when an index is configured with a language).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# analyzer.go:46-68 italianStopWords, verbatim.
ITALIAN_STOPWORDS = [
    "a", "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli", "dall",
    "dagl", "dalla", "dalle",
    "di", "del", "dello", "dei", "degli", "dell", "degl", "della", "delle",
    "e", "ed", "in", "nel", "nello", "nei", "negli", "nell", "negl",
    "nella", "nelle",
    "su", "sul", "sullo", "sui", "sugli", "sull", "sugl", "sulla", "sulle",
    "per", "tra", "contro", "io", "tu", "lui", "lei", "noi", "voi", "loro",
    "mio", "mia", "miei", "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua",
    "suoi", "sue",
    "nostro", "nostra", "nostri", "nostre", "vostro", "vostra", "vostri",
    "vostre",
    "mi", "ti", "ci", "vi", "lo", "la", "li", "le", "gli", "ne",
    "il", "un", "uno", "una", "ma", "se", "perché", "anche", "come",
    "dov", "dove", "che", "chi", "cui", "non", "più", "quale", "quanto",
    "quanti",
    "quanta", "quante", "quello", "quelli", "quella", "quelle", "questo",
    "questi",
    "questa", "queste", "si", "ho", "hai", "ha", "abbiamo", "avete",
    "hanno",
    "abbia", "abbiate", "abbiano", "avrò", "avrai", "avrà", "avremo",
    "avrete", "avranno",
    "avrei", "avresti", "avrebbe", "avremmo", "avreste", "avrebbero",
    "avevo", "avevi",
    "aveva", "avevamo", "avevate", "avevano", "ebbi", "avesti", "ebbe",
    "avemmo",
    "aveste", "ebbero", "fui", "fosti", "fu", "fummo", "foste", "furono",
    "ero", "eri", "era", "eravamo", "eravate", "erano", "sarei", "saresti",
    "sarebbe", "saremmo", "sareste", "sarebbero", "sono", "sei", "è",
    "siamo",
    "siete", "sia", "siate", "siano", "sto", "stai", "sta", "stiamo",
    "state", "stanno",
]

_VOWELS = frozenset(b"aeiou")


def _is_vowel(ch: int) -> bool:
    return ch in _VOWELS


def _regions(runes: list[str]) -> tuple[int, int, int]:
    """R1/R2/RV on rune indices (getItalianRegions,
    stemmer_italian.go:40-88)."""
    n = len(runes)
    r1 = r2 = rv = n
    if n == 0:
        return r1, r2, rv

    def vow(c: str) -> bool:
        return c in "aeiou"

    if n > 2:
        if not vow(runes[1]):
            for i in range(2, n):
                if vow(runes[i]):
                    rv = i + 1
                    break
        elif vow(runes[0]) and vow(runes[1]):
            for i in range(2, n):
                if not vow(runes[i]):
                    rv = i + 1
                    break
        else:
            rv = 3

    for i in range(1, n):
        if vow(runes[i - 1]) and not vow(runes[i]):
            r1 = i + 1
            break
    for i in range(r1, n):
        if vow(runes[i - 1]) and not vow(runes[i]):
            r2 = i + 1
            break
    return r1, r2, rv


def _replace_suffix(s: bytes, region: int, old: bytes, new: bytes):
    """replaceSuffixIfInRegionIT (stemmer_italian.go:213-222): byte
    suffix position checked against the (rune-indexed) region — the
    Go code's exact arithmetic."""
    if s.endswith(old) and len(s) - len(old) >= region:
        return s[: len(s) - len(old)] + new, True
    return s, False


_PRONOUNS = [
    b"gliela", b"gliele", b"glieli", b"glielo", b"gliene", b"cela",
    b"cele", b"celi", b"celo", b"cene",
    b"mela", b"mele", b"meli", b"melo", b"mene", b"tela", b"tele",
    b"teli", b"telo", b"tene",
    b"vela", b"vele", b"veli", b"velo", b"vene", b"ci", b"gli", b"la",
    b"le", b"li", b"lo",
    b"mi", b"ne", b"si", b"ti", b"vi",
]

# (suffix, replacement, region selector) — step1_standard_suffixes,
# stemmer_italian.go:156-180. Region: 0=r1, 1=r2, 2=rv. Accented
# entries are unmatchable post-normalization; kept for fidelity.
_STEP1 = [
    ("mente", "", 2), ("atrice", "", 1), ("atrici", "", 1),
    ("anza", "", 0), ("anze", "", 0), ("ico", "", 0), ("ici", "", 0),
    ("ica", "", 0), ("ice", "", 0), ("iche", "", 0), ("ichi", "", 0),
    ("ismo", "", 0), ("ismi", "", 0), ("ista", "", 0), ("iste", "", 0),
    ("isti", "", 0), ("istà", "", 0), ("istè", "", 0), ("istì", "", 0),
    ("oso", "", 0), ("osi", "", 0), ("osa", "", 0), ("ose", "", 0),
    ("ità", "", 0), ("logia", "log", 0), ("logie", "log", 0),
    ("azione", "", 1), ("azioni", "", 1), ("atore", "", 1),
    ("abilità", "", 1), ("ibili", "", 1), ("abile", "", 1),
    ("ività", "", 2), ("ivo", "", 2), ("ivi", "", 2), ("iva", "", 2),
    ("ive", "", 2),
]
_STEP1 = [(s.encode(), r.encode(), reg) for s, r, reg in _STEP1]

_STEP2 = [
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate",
    "ammo", "ando", "asse", "assi", "emmo", "endo", "erai", "erei",
    "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce", "isci",
    "isco",
    "ano", "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo",
    "erà", "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire",
    "irò", "ita",
    "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
    "uti", "uto", "ar", "ir",
]
_STEP2 = [s.encode() for s in _STEP2]

_ACCENT_MAP = {"à": "a", "è": "e", "ì": "i", "ò": "o", "ù": "u"}


def _step0(s: bytes, rv: int) -> bytes:
    for p in _PRONOUNS:
        new_s, ok = _replace_suffix(s, rv, p, b"")
        if ok:
            if new_s.endswith(b"cher") or new_s.endswith(b"gher"):
                return new_s[:-2]
            return new_s
    return s


def _step1(s: bytes, r1: int, r2: int, rv: int) -> bytes:
    regions = (r1, r2, rv)
    for suf, repl, reg in _STEP1:
        new_s, ok = _replace_suffix(s, regions[reg], suf, repl)
        if ok:
            return new_s
    return s


def _step2(s: bytes, rv: int) -> bytes:
    for suf in _STEP2:
        new_s, ok = _replace_suffix(s, rv, suf, b"")
        if ok:
            return new_s
    return s


def _step3(s: bytes, rv: int) -> bytes:
    if (s.endswith(b"a") or s.endswith(b"e") or s.endswith(b"i")
            or s.endswith(b"o")):
        new_s, ok = _replace_suffix(s, rv, s[-1:], b"")
        if ok:
            return new_s
    # Unreachable when the branch above fires (same region test) —
    # replicated from the Go code as-is.
    if s.endswith(b"chi") or s.endswith(b"ghi"):
        new_s, ok = _replace_suffix(s, rv, s[-1:], b"")
        if ok:
            return new_s[:-1]
    return s


def stem_word_it(word: str) -> str:
    """stemItalian (stemmer_italian.go:91-132), byte-faithful."""
    if len(word.encode("utf-8")) < 3:  # Go len() is bytes
        return word
    s = word.lower()
    for acc, plain in _ACCENT_MAP.items():
        s = s.replace(acc, plain)
    runes = list(s)
    for i in range(1, len(runes) - 1):
        if runes[i] in "iu" and runes[i - 1] in "aeiou" and runes[i + 1] in "aeiou":
            runes[i] = runes[i].upper()
    r1, r2, rv = _regions(runes)
    b = "".join(runes).encode("utf-8")

    b = _step0(b, rv)
    before1 = b
    b = _step1(b, r1, r2, rv)
    if b == before1:
        b = _step2(b, rv)
    b = _step3(b, rv)

    out = b.decode("utf-8", errors="surrogateescape")
    return out.replace("I", "i").replace("U", "u")


def stem_tokens_it(toks: pd.Series) -> pd.Series:
    """Vectorized batch stem over array<string> token columns."""
    return toks.map(
        lambda arr: [stem_word_it(t) for t in arr] if arr is not None else None
    )


def stem_udf_it():
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    return pandas_udf(stem_tokens_it, ArrayType(StringType()),
                      PandasUDFType.SCALAR)


def analyze_italian(col):
    """ItalianStemmer.Analyze (stemmer_italian.go:18-26): tokenize,
    drop Italian stopwords, stem. Tokenization + stopword removal stay
    JVM-side (codegen'd); only the stem drops to the pandas UDF."""
    stops = ", ".join(f"'{w}'" for w in ITALIAN_STOPWORDS)
    raw = (
        f"filter(regexp_extract_all(lower({col}), '[\\\\p{{L}}0-9_]+', 0), "
        f"t -> NOT array_contains(array({stops}), t))"
    )
    return stem_udf_it()(F.expr(raw))
