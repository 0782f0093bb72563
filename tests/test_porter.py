"""Golden tests for the original Porter algorithm.

Expected values come from the published algorithm's own worked examples
(Porter, 1980, "An algorithm for suffix stripping") — the same semantics
Lucene's PorterStemFilter implements, which the reference uses via JNI
(/root/reference/src/searcher/lucene/index.rs:81-83).
"""

import pytest

from rustserini_spark.analysis.porter import porter_stem

PAPER_CASES = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    # step 2 (full-algorithm outputs)
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formality", "formal"),
    ("sensitivity", "sensit"),
    ("sensibility", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electricity", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angularity", "angular"),  # iti via step2 aliti->al
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # misc well-known outputs
    ("scientific", "scientif"),
    ("minds", "mind"),
    ("presence", "presenc"),
    ("manhattan", "manhattan"),
    ("project", "project"),
    ("success", "success"),
    ("lead", "lead"),
    ("generalizations", "gener"),
    ("oscillators", "oscil"),
    # Lucene/tartarus DEPARTURE rules vs the 1980 paper (PorterStemmer.java):
    # 'bli'->'ble' (replacing the paper's 'abli'->'able') and 'logi'->'log'.
    ("possibly", "possibl"),
    ("technology", "technolog"),
    ("technological", "technolog"),
    ("geology", "geologi"),  # m("geo")=0 blocks logi->log, same as Lucene
    ("probably", "probabl"),
]


@pytest.mark.parametrize("word,expected", PAPER_CASES)
def test_porter_paper_cases(word, expected):
    assert porter_stem(word) == expected


def test_short_words_unchanged():
    for w in ("a", "is", "by", "ox"):
        assert porter_stem(w) == w


def test_idempotent_on_random_words():
    # stemming is not idempotent in general for Porter, but our outputs on the
    # synthetic vocab should be stable strings (re-stem may differ; just check type)
    assert isinstance(porter_stem("windowing"), str)
