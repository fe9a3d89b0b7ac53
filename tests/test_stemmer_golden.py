"""Golden-vector parity test for the English stemmer (T1).

The vectors are the reference's own test suite
(pkg/textanalyzer/stemmer_english_test.go — 70 input/expected pairs,
which that file says are aligned with official Snowball Porter2
results, with a handful of deliberate deviations). Passing ALL of
them is the parity contract for functions/stemmer.py.
"""

from kektordb_spark.functions.stemmer import stem_word

VECTORS = [
    ('', ''),
    ('a', 'a'),
    ('run', 'run'),
    ("cat's", 'cat'),
    ("cats'", 'cat'),
    ('caresses', 'caress'),
    ('ponies', 'poni'),
    ('ties', 'ti'),
    ('caress', 'caress'),
    ('cats', 'cat'),
    ('feed', 'feed'),
    ('agreed', 'agre'),
    ('plastered', 'plaster'),
    ('motoring', 'motor'),
    ('sing', 'sing'),
    ('conflated', 'conflat'),
    ('troubled', 'troubl'),
    ('sized', 'size'),
    ('hopping', 'hop'),
    ('tanning', 'tan'),
    ('falling', 'fall'),
    ('hissing', 'hiss'),
    ('fizzed', 'fizz'),
    ('failing', 'fail'),
    ('filing', 'file'),
    ('happy', 'happi'),
    ('sky', 'ski'),
    ('relational', 'relat'),
    ('conditional', 'condit'),
    ('rational', 'ration'),
    ('valency', 'valenc'),
    ('hesitancy', 'hesit'),
    ('digitizer', 'digit'),
    ('conformabli', 'conform'),
    ('radicalli', 'radic'),
    ('differentli', 'differ'),
    ('vileli', 'vile'),
    ('analogousli', 'analog'),
    ('vietnamization', 'vietnam'),
    ('predication', 'predic'),
    ('operator', 'oper'),
    ('feudalism', 'feudal'),
    ('decisiveness', 'decis'),
    ('hopefulness', 'hope'),
    ('callousness', 'callous'),
    ('formaliti', 'formal'),
    ('sensitiviti', 'sensit'),
    ('sensibiliti', 'sensibl'),
    ('triplicate', 'triplic'),
    ('formative', 'format'),
    ('formalize', 'formal'),
    ('electriciti', 'electr'),
    ('electrical', 'electr'),
    ('hopeful', 'hope'),
    ('goodness', 'good'),
    ('revival', 'reviv'),
    ('allowance', 'allow'),
    ('inference', 'infer'),
    ('airliner', 'airlin'),
    ('gyroscopic', 'gyroscop'),
    ('adjustable', 'adjust'),
    ('defensible', 'defens'),
    ('irritant', 'irrit'),
    ('replacement', 'replac'),
    ('adjustment', 'adjust'),
    ('probate', 'probat'),
    ('rate', 'rate'),
    ('cease', 'ceas'),
    ('controll', 'control'),
    ('roll', 'roll'),
]


def test_all_reference_vectors():
    bad = [(w, stem_word(w), want) for w, want in VECTORS if stem_word(w) != want]
    assert not bad, bad


# ---------------------------------------------------------------------------
# Italian stemmer (stemmer_italian.go:91-225)
# ---------------------------------------------------------------------------
#
# The reference's own Italian suite (stemmer_italian_test.go) is
# t.Skip-ped because the implementation deviates from official
# Snowball; parity here means matching the IMPLEMENTATION. The first
# table is the subset of the reference's vectors its code actually
# satisfies (asserted verbatim); the second pins the divergent cases
# with the implementation's real outputs, each traced to the code path
# that produces it.

from kektordb_spark.functions.stemmer_italian import stem_word_it

VECTORS_IT = [
    ("", ""), ("il", "il"), ("casa", "cas"), ("gatto", "gatt"),
    ("strada", "strad"), ("case", "cas"), ("strade", "strad"),
    ("parlare", "parl"), ("parlava", "parl"), ("parlato", "parl"),
    ("parleranno", "parl"), ("parlando", "parl"), ("vedo", "ved"),
    ("vedere", "ved"), ("visto", "vist"), ("finire", "fin"),
    ("finisco", "fin"), ("finito", "fin"), ("velocemente", "veloc"),
    ("felicemente", "felic"), ("operatore", "oper"),
    ("operatrice", "oper"), ("città", "citt"), ("trovarlo", "trov"),
    ("chiodo", "chiod"), ("gioia", "gioi"),
    ("io", "io"), ("noi", "noi"), ("lui", "lui"), ("lei", "lei"),
]

# (word, snowball_expected, implementation_output, why)
VECTORS_IT_IMPL = [
    ("tavolo", "tavol", "tav", "step0 strips pronoun 'lo' from nouns"),
    ("tavoli", "tavol", "tav", "step0 strips pronoun 'li'"),
    ("gatti", "gatt", "gat", "step0 strips pronoun 'ti'"),
    ("nazionale", "nazional", "nazion",
     "step2 'ale'? no - step0 strips 'le' then step3 vowel"),
    ("globalizzazione", "globalizz", "globalizzazi",
     "step0 strips pronoun 'ne' so 'azione' never matches"),
    ("perché", "perch", "perché",
     "é is not accent-normalized (only grave accents are); byte-suffix "
     "checks then never match the trailing multibyte é"),
    ("poté", "pot", "poté", "same é non-normalization"),
    ("vederla", "ved", "veder",
     "step0 strips 'la'; remaining 'er' is not in the verb-suffix list"),
    ("dammelo", "dammel", "dam", "step0 strips compound pronoun 'melo'"),
    ("banchi", "banc", "banch",
     "step3 removes the bare final vowel before the chi/ghi branch can "
     "normalize, so the 'h' survives (dead-code branch)"),
    ("funghi", "fung", "fungh", "same dead chi/ghi branch"),
    ("aiuola", "aiuol", "aiu",
     "step0 strips 'la' from the marked-I form 'aIuola'"),
]


def test_italian_golden_reference_subset():
    for word, expected in VECTORS_IT:
        assert stem_word_it(word) == expected, word


def test_italian_implementation_pins():
    for word, _snowball, impl, _why in VECTORS_IT_IMPL:
        assert stem_word_it(word) == impl, word


def test_italian_stopwords_shape():
    from kektordb_spark.functions.stemmer_italian import ITALIAN_STOPWORDS

    s = set(ITALIAN_STOPWORDS)
    assert {"di", "della", "perché", "è", "stanno"} <= s
    assert len(s) == len(ITALIAN_STOPWORDS)  # no dups in the port
