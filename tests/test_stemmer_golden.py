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
