"""Porter stemmer (original 1980 algorithm).

A from-scratch Python implementation of M.F. Porter's stemming
algorithm ("An algorithm for suffix stripping", Program 14(3) 1980),
with the same two documented departures as the author's reference C
implementation (which the reference engine's analyzer stem filter is a
faithful port of — see SURVEY.md §2.2, upstream
``lucene/analysis/common/.../en/PorterStemFilter.java`` /
``PorterStemmer.java`` [U]):

- words of length <= 2 are left unchanged;
- step 2 maps ``-bli`` -> ``-ble`` (instead of ``-abli`` -> ``-able``)
  and adds ``-logi`` -> ``-log``.

Pure function of its input; no state, safe to call from Ray workers.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


class _Stem:
    """Mutable stemming buffer over word[0..k] (inclusive)."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Measure: number of VC sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        ln = len(s)
        if ln > self.k + 1:
            return False
        if self.b[self.k - ln + 1 : self.k + 1] != list(s):
            return False
        self.j = self.k - ln
        return True

    def setto(self, s: str) -> None:
        self.b[self.j + 1 : self.k + 1] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if self.m() > 0:
            self.setto(s)

    # --- steps (numbered per the paper) ---

    def step1ab(self) -> None:
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                if ch not in ("l", "s", "z"):
                    self.k -= 1
            elif self.m() == 1 and self.cvc(self.k):
                self.j = self.k
                self.setto("e")

    def step1c(self) -> None:
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    def step2(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        if c == "a":
            if self.ends("ational"):
                self.r("ate")
            elif self.ends("tional"):
                self.r("tion")
        elif c == "c":
            if self.ends("enci"):
                self.r("ence")
            elif self.ends("anci"):
                self.r("ance")
        elif c == "e":
            if self.ends("izer"):
                self.r("ize")
        elif c == "l":
            if self.ends("bli"):
                self.r("ble")
            elif self.ends("alli"):
                self.r("al")
            elif self.ends("entli"):
                self.r("ent")
            elif self.ends("eli"):
                self.r("e")
            elif self.ends("ousli"):
                self.r("ous")
        elif c == "o":
            if self.ends("ization"):
                self.r("ize")
            elif self.ends("ation"):
                self.r("ate")
            elif self.ends("ator"):
                self.r("ate")
        elif c == "s":
            if self.ends("alism"):
                self.r("al")
            elif self.ends("iveness"):
                self.r("ive")
            elif self.ends("fulness"):
                self.r("ful")
            elif self.ends("ousness"):
                self.r("ous")
        elif c == "t":
            if self.ends("aliti"):
                self.r("al")
            elif self.ends("iviti"):
                self.r("ive")
            elif self.ends("biliti"):
                self.r("ble")
        elif c == "g":
            if self.ends("logi"):
                self.r("log")

    def step3(self) -> None:
        c = self.b[self.k]
        if c == "e":
            if self.ends("icate"):
                self.r("ic")
            elif self.ends("ative"):
                self.r("")
            elif self.ends("alize"):
                self.r("al")
        elif c == "i":
            if self.ends("iciti"):
                self.r("ic")
        elif c == "l":
            if self.ends("ical"):
                self.r("ic")
            elif self.ends("ful"):
                self.r("")
        elif c == "s":
            if self.ends("ness"):
                self.r("")

    def step4(self) -> None:
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        if c == "a":
            if not self.ends("al"):
                return
        elif c == "c":
            if not (self.ends("ance") or self.ends("ence")):
                return
        elif c == "e":
            if not self.ends("er"):
                return
        elif c == "i":
            if not self.ends("ic"):
                return
        elif c == "l":
            if not (self.ends("able") or self.ends("ible")):
                return
        elif c == "n":
            if not (
                self.ends("ant")
                or self.ends("ement")
                or self.ends("ment")
                or self.ends("ent")
            ):
                return
        elif c == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass
            elif self.ends("ou"):
                pass
            else:
                return
        elif c == "s":
            if not self.ends("ism"):
                return
        elif c == "t":
            if not (self.ends("ate") or self.ends("iti")):
                return
        elif c == "u":
            if not self.ends("ous"):
                return
        elif c == "v":
            if not self.ends("ive"):
                return
        elif c == "z":
            if not self.ends("ize"):
                return
        else:
            return
        if self.m() > 1:
            self.k = self.j

    def step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1


def stem(word: str) -> str:
    """Stem one lowercase token. Length <= 2 is returned unchanged.

    Digit-final fast path: every Porter rule (steps 1–4 suffix matches;
    step 5's trailing 'e' / double-'l') requires an ALPHABETIC final
    character, so a token ending in a digit can never change — skipped
    outright. On long-tail corpora (hash-suffixed identifiers) this is
    the majority of the vocabulary and halves analysis CPU."""
    if len(word) <= 2 or word[-1].isdigit():
        return word
    s = _Stem(word)
    s.step1ab()
    s.step1c()
    s.step2()
    s.step3()
    s.step4()
    s.step5()
    return "".join(s.b[: s.k + 1])
