"""Porter stemmer conformance against published algorithm examples."""

from __future__ import annotations

import pytest

from engine.porter import stem

# (word, stem) pairs from Porter's 1980 paper + the reference C
# implementation's documented behavior (martin porter's sample vocab).
CASES = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
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
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
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
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # stemmable families from the fixture corpus (FIXTURES.md F1)
    ("running", "run"),
    ("runs", "run"),
    ("run", "run"),
    ("connection", "connect"),
    ("connected", "connect"),
    ("connecting", "connect"),
    ("connections", "connect"),
]


@pytest.mark.parametrize("word,expected", CASES)
def test_porter_case(word, expected):
    assert stem(word) == expected


def test_short_words_unchanged():
    for w in ["a", "is", "be", "on", "ax"]:
        assert stem(w) == w


def test_sql_porter_matches_python():
    """engine/sqlporter.py (the DuckDB transcription of the published
    1980 algorithm) must agree with engine/porter.py on the paper's
    example words, the reference departures, y-class edge cases, and
    digit/short-token pass-through."""
    import duckdb

    from engine.porter import stem
    from engine.sqlporter import porter_cte_chain

    words = sorted(set("""caresses ponies ties caress cats feed agreed
      plastered bled motoring sing conflated troubled sized hopping
      tanned falling hissing fizzed failing filing relational
      conditional rational valenci hesitanci digitizer conformabli
      radicalli differentli vileli analogousli vietnamization
      predication operator feudalism decisiveness hopefulness
      callousness formaliti sensitiviti sensibiliti triplicate
      formative formalize electriciti electrical hopeful goodness
      revival allowance inference airliner gyroscopic adjustable
      defensible irritant replacement adjustment dependent adoption
      communism activate angulariti homologou homologous effective
      bowdlerize probate rate cease control roll generalization
      oscillators abilities agreement yyy syzygy toy tray enjoyment
      dying lying tying news innings proceed exceed succeed happy sky
      ab x9 a e33 controll bli logi""".split()))
    vals = ",".join(f"('{w}')" for w in words)
    sql = f"""WITH RECURSIVE src(term) AS (VALUES {vals}),
{porter_cte_chain('src')}
SELECT term, stem FROM pstem"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = {w: (stem(w), got.get(w))
           for w in words if got.get(w) != stem(w)}
    assert not bad, bad
