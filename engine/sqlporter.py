"""Porter stemmer transcribed to DuckDB SQL.

Generates a CTE chain that replays the ORIGINAL 1980 Porter algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3)),
with the same two reference-implementation departures as
``engine/porter.py`` (len<=2 unchanged; step 2 ``-bli``→``-ble`` and
``-logi``→``-log``) — so the ``bm25_topk_analyzed`` oracle replays
the FULL analysis chain in SQL instead of a pinned golden hash. The
transcription is independent of the Python implementation's code: it
encodes the published rule tables directly (suffix lists, measure/
vowel/double-consonant/cvc conditions), and the two implementations
are cross-checked by ``tests/test_porter.py::
test_sql_porter_matches_python`` over the corpus vocabulary plus the
published example words.

Mechanics: consonant/vowel classes need left-to-right resolution
(``y`` is a vowel iff the previous letter's class is consonant), so
each step's class string ``cv`` is built by a RECURSIVE CTE walking
the word one character at a time; measure m(stem) is then
``len(regexp_extract_all(substr(cv,1,L), 'v+c+'))`` and the *v* / *d
/ *o conditions are substr tests against ``cv``. Each Porter step is
one CASE expression over (word, cv), chained through CTEs; the word
mutates between steps, so ``cv`` is recomputed per step.
"""

from __future__ import annotations


def _cv_cte(name: str, src: str, wcol: str) -> str:
    """Recursive CTE computing the consonant/vowel class string for
    every distinct word in ``src.wcol``; exposes ``{name}(w, cv)``."""
    return f"""{name}_r AS (
  SELECT {wcol} AS w, 0 AS i, '' AS cv FROM (SELECT DISTINCT {wcol}
                                             FROM {src})
  UNION ALL
  SELECT w, i + 1,
    cv || CASE
      WHEN substr(w, i + 1, 1) IN ('a','e','i','o','u') THEN 'v'
      WHEN substr(w, i + 1, 1) = 'y' AND i > 0
           AND substr(cv, i, 1) = 'c' THEN 'v'
      ELSE 'c' END
  FROM {name}_r WHERE i < len(w)),
{name} AS (SELECT w, cv FROM {name}_r WHERE i = len(w))"""


def _m(cv: str, L: str) -> str:
    return f"len(regexp_extract_all(substr({cv}, 1, {L}), 'v+c+'))"


def _vowel(cv: str, L: str) -> str:
    return f"(substr({cv}, 1, {L}) LIKE '%v%')"


def _doublec(w: str, cv: str, L: str) -> str:
    return (f"(({L}) >= 2 AND substr({w}, ({L}), 1) = "
            f"substr({w}, ({L}) - 1, 1) "
            f"AND substr({cv}, ({L}), 1) = 'c')")


def _cvc(w: str, cv: str, L: str) -> str:
    return (f"(({L}) >= 3 AND substr({cv}, ({L}) - 2, 3) = 'cvc' "
            f"AND substr({w}, ({L}), 1) NOT IN ('w','x','y'))")


def _trunc(w: str, n: str) -> str:
    return f"substr({w}, 1, {n})"


# (suffix, replacement) tables per step, in the paper's elif order —
# flattened: each suffix's penultimate (step 2/4) or final (step 3)
# letter is its switch key, so at most one branch can match a word
_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble"), ("logi", "log")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def _rule_case(w: str, cv: str, rules, min_m: int) -> str:
    """CASE over (suffix → replacement) rules: first matching suffix
    decides; the rewrite fires only when m(stem) > ``min_m`` (the
    paper's r() for step 2/3, m>1 for step 4), else unchanged."""
    whens = []
    for suf, rep in rules:
        ls = len(suf)
        stem = _trunc(w, f"len({w}) - {ls}")
        cond = f"{w} LIKE '%{suf}'"
        if suf == "ion":         # step 4's extra: stem ends s or t
            cond += (f" AND len({w}) > {ls} AND "
                     f"substr({w}, len({w}) - {ls}, 1) IN ('s','t')")
        act = (f"CASE WHEN {_m(cv, f'len({w}) - {ls}')} > {min_m} "
               f"THEN {stem} || '{rep}' ELSE {w} END")
        whens.append(f"WHEN {cond} THEN {act}")
    return "CASE " + " ".join(whens) + f" ELSE {w} END"


def porter_cte_chain(src: str, term_col: str = "term") -> str:
    """CTE chain stemming every distinct word of ``src.term_col``;
    exposes ``pstem(term, stem)``. Embed after a ``WITH RECURSIVE``.
    Words of len <= 2 or ending in a digit pass through unchanged
    (the reference short-circuits)."""
    # --- step 1a (plurals) needs no cv
    s1a = f"""p0 AS (SELECT DISTINCT {term_col} AS term FROM {src}),
pg AS (SELECT term FROM p0
       WHERE len(term) > 2
         AND substr(term, len(term), 1) NOT BETWEEN '0' AND '9'),
s1a AS (SELECT term, CASE
    WHEN term LIKE '%sses' THEN substr(term, 1, len(term) - 2)
    WHEN term LIKE '%ies'  THEN substr(term, 1, len(term) - 3) || 'i'
    WHEN term LIKE '%ss'   THEN term
    WHEN term LIKE '%s'    THEN substr(term, 1, len(term) - 1)
    ELSE term END AS w FROM pg)"""

    # --- step 1b (eed / ed / ing) on w with cv1
    w, cv = "s.w", "c.cv"
    led = f"len({w}) - 2"
    ling = f"len({w}) - 3"

    def inner(L: str) -> str:
        t = _trunc(w, L)
        tl = L
        return f"""CASE
      WHEN {t} LIKE '%at' OR {t} LIKE '%bl' OR {t} LIKE '%iz'
        THEN {t} || 'e'
      WHEN {_doublec(w, cv, tl)}
           AND substr({w}, ({tl}), 1) NOT IN ('l','s','z')
        THEN {_trunc(w, f'({tl}) - 1')}
      WHEN {_m(cv, tl)} = 1 AND {_cvc(w, cv, tl)} THEN {t} || 'e'
      ELSE {t} END"""

    s1b = f"""{_cv_cte('cv1', 's1a', 'w')},
s1b AS (SELECT term, CASE
    WHEN {w} LIKE '%eed' THEN
      CASE WHEN {_m(cv, f"len({w}) - 3")} > 0
           THEN {_trunc(w, f'len({w}) - 1')} ELSE {w} END
    WHEN {w} LIKE '%ed' AND {_vowel(cv, led)} THEN {inner(led)}
    WHEN {w} LIKE '%ing' AND {_vowel(cv, ling)} THEN {inner(ling)}
    ELSE {w} END AS w
  FROM s1a s JOIN cv1 c ON c.w = s.w)"""

    # --- step 1c (y -> i when stem has vowel)
    s1c = f"""{_cv_cte('cv2', 's1b', 'w')},
s1c AS (SELECT term, CASE
    WHEN {w} LIKE '%y' AND {_vowel(cv, f"len({w}) - 1")}
      THEN {_trunc(w, f'len({w}) - 1')} || 'i'
    ELSE {w} END AS w
  FROM s1b s JOIN cv2 c ON c.w = s.w)"""

    s2 = f"""{_cv_cte('cv3', 's1c', 'w')},
s2 AS (SELECT term, {_rule_case(w, cv, _STEP2, 0)} AS w
  FROM s1c s JOIN cv3 c ON c.w = s.w)"""

    s3 = f"""{_cv_cte('cv4', 's2', 'w')},
s3 AS (SELECT term, {_rule_case(w, cv, _STEP3, 0)} AS w
  FROM s2 s JOIN cv4 c ON c.w = s.w)"""

    s4 = f"""{_cv_cte('cv5', 's3', 'w')},
s4 AS (SELECT term, {_rule_case(w, cv,
                                [(x, '') for x in _STEP4], 1)} AS w
  FROM s3 s JOIN cv5 c ON c.w = s.w)"""

    # --- step 5: trailing-e drop, then double-l; the l-branch's m()
    # deliberately measures the step-5-ENTRY word (j stays at the
    # entry k even after the e drop — reference behavior)
    Lw = f"len({w})"
    e_drop = (f"CASE WHEN {w} LIKE '%e' AND ({_m(cv, Lw)} > 1 OR "
              f"({_m(cv, Lw)} = 1 AND NOT "
              f"{_cvc(w, cv, f'{Lw} - 1')})) "
              f"THEN {_trunc(w, f'{Lw} - 1')} ELSE {w} END")
    s5 = f"""{_cv_cte('cv6', 's4', 'w')},
s5a AS (SELECT term, {e_drop} AS w, {_m(cv, Lw)} AS m_entry
  FROM s4 s JOIN cv6 c ON c.w = s.w),
s5 AS (SELECT term, CASE
    WHEN w LIKE '%ll' AND m_entry > 1
      THEN substr(w, 1, len(w) - 1) ELSE w END AS w
  FROM s5a)"""

    return f"""{s1a},
{s1b},
{s1c},
{s2},
{s3},
{s4},
{s5},
pstem AS (
  SELECT p0.term,
         COALESCE(s5.w, p0.term) AS stem
  FROM p0 LEFT JOIN s5 ON s5.term = p0.term)"""
