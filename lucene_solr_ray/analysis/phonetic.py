"""Phonetic encoders + PhoneticFilter
(``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java`` — Lucene delegates the encodings to
commons-codec; each encoder here is re-implemented from the published
algorithm descriptions: Soundex (Knuth TAOCP vol. 3 / NARA standard),
Refined Soundex, Metaphone (Lawrence Philips, Computer Language 7(12),
1990), NYSIIS (Taft 1970), Caverphone 2.0 (David Hood, Caversham
project revision 2004)).

Encoders are ``str -> str`` on a single token; the filter factory wraps
one into the token-filter protocol with the reference's ``inject``
semantics (inject=True keeps the original token AND adds the phonetic
code at the same position; inject=False replaces the token)."""

from __future__ import annotations

import re
from collections.abc import Callable

TokenStream = list[tuple[str, int]]

_LETTERS = re.compile(r"[^A-Z]")


def _clean(word: str) -> str:
    return _LETTERS.sub("", word.upper())


# ------------------------------------------------------------- soundex --

_SOUNDEX_MAP = {c: d for cs, d in (
    ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
    ("L", "4"), ("MN", "5"), ("R", "6")) for c in cs}


def soundex(word: str) -> str:
    """American Soundex, 4-char zero-padded code.

    H/W are transparent (two same-code consonants separated by H or W
    encode once); vowels reset the run (they encode twice). Examples
    traced from the NARA rules: Robert->R163, Ashcraft->A261,
    Tymczak->T522, Pfister->P236, Honeyman->H555.
    """
    w = _clean(word)
    if not w:
        return ""
    out = [w[0]]
    last = _SOUNDEX_MAP.get(w[0], "")
    for c in w[1:]:
        if c in "HW":           # transparent: do not reset the run
            continue
        code = _SOUNDEX_MAP.get(c, "")
        if code and code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code             # vowels ("") reset the run
    return "".join(out).ljust(4, "0")


# ---------------------------------------------------- refined soundex --

#: per-letter codes A..Z (Refined Soundex table: BP=1 FV=2 CKS=3 GJ=4
#: QXZ=5 DT=6 L=7 MN=8 R=9, vowels/HWY=0)
_REFINED = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    """Refined Soundex: first letter + code per letter, consecutive
    duplicates collapsed, vowels coded 0, no length cap.
    dogs->D6043, testing->T6036084."""
    w = _clean(word)
    if not w:
        return ""
    out = [w[0]]
    last = None
    for c in w:
        code = _REFINED[ord(c) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# ----------------------------------------------------------- metaphone --

_VOWELS = "AEIOU"
_FRONTV = "EIY"          # front vowels soften C/G
_VARSON = "CSPTG"        # H silent after these


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone (Philips 1990), 4-char cap like the reference default.

    the quick brown fox jumped over the lazy dogs ->
    0 KK BRN FKS JMPT OFR 0 LS TKS
    """
    w = _clean(word)
    if not w:
        return ""
    if len(w) == 1:
        return w

    # initial-pair exceptions
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]

    n = len(w)
    code: list[str] = []

    def at(i: int) -> str:
        return w[i] if 0 <= i < n else ""

    def _in(s: str, chars: str) -> bool:
        # guard: "" is a substring of every string, but an out-of-range
        # position must never match a character class
        return len(s) == 1 and s in chars

    def is_vowel(i: int) -> bool:
        return _in(at(i), _VOWELS)

    def region(i: int, s: str) -> bool:
        return w[i:i + len(s)] == s

    i = 0
    while i < n and len(code) < max_code_len:
        c = w[i]
        # adjacent duplicates collapse, except C (needed for CC rules)
        if c != "C" and i > 0 and at(i - 1) == c:
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            # final -MB: B silent
            if not (i == n - 1 and at(i - 1) == "M"):
                code.append("B")
        elif c == "C":
            if at(i - 1) == "S" and _in(at(i + 1), _FRONTV):
                pass                      # SCE/SCI/SCY: C silent
            elif region(i, "CIA"):
                code.append("X")
            elif _in(at(i + 1), _FRONTV):
                code.append("S")
            elif at(i - 1) == "S" and at(i + 1) == "H":
                code.append("K")          # SCH -> K
            elif at(i + 1) == "H":
                if i == 0 and n >= 3 and not is_vowel(2):
                    code.append("K")      # CHR- etc.
                else:
                    code.append("X")      # CH -> X
            else:
                code.append("K")
        elif c == "D":
            if at(i + 1) == "G" and _in(at(i + 2), _FRONTV):
                code.append("J")          # DGE/DGI/DGY
                i += 2
            else:
                code.append("T")
        elif c == "G":
            silent = False
            if at(i + 1) == "H" and not (i + 1 == n - 1 or is_vowel(i + 2)):
                silent = True             # GH not at end / before vowel
            if i > 0 and (region(i, "GN") or region(i, "GNED")
                          ) and (i + 2 == n or region(i, "GNED")
                                 and i + 4 == n):
                silent = True             # -GN / -GNED
            if at(i - 1) == "G":          # GG: only the second G codes
                pass
            elif silent:
                pass
            elif _in(at(i + 1), _FRONTV):
                code.append("J")
            else:
                code.append("K")
        elif c == "H":
            if is_vowel(i - 1) and not is_vowel(i + 1):
                pass                      # silent between vowel and cons
            elif _in(at(i - 1), _VARSON):
                pass                      # CH/SH/PH/TH/GH handled there
            else:
                code.append("H")
        elif c == "F":
            code.append("F")
        elif c == "J":
            code.append("J")
        elif c == "K":
            if at(i - 1) != "C":
                code.append("K")
        elif c in "LMNR":
            code.append(c)
        elif c == "P":
            code.append("F" if at(i + 1) == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if region(i, "SH") or region(i, "SIO") or region(i, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if region(i, "TIA") or region(i, "TIO"):
                code.append("X")
            elif region(i, "TCH"):
                pass                      # silent in -TCH-
            elif at(i + 1) == "H":
                code.append("0")          # theta
            else:
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c == "W":
            if is_vowel(i + 1):
                code.append("W")
        elif c == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif c == "Y":
            if is_vowel(i + 1):
                code.append("Y")
        elif c == "Z":
            code.append("S")
        i += 1
    return "".join(code)


# -------------------------------------------------------------- nysiis --

def nysiis(word: str) -> str:
    """NYSIIS (New York State Identification and Intelligence System,
    Taft 1970), original ruleset, no length cap."""
    w = _clean(word)
    if not w:
        return ""
    # first-letter transforms
    for src, dst in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(src):
            w = dst + w[len(src):]
            break
    # last-letter transforms
    for src, dst in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(src):
            w = w[:-len(src)] + dst
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        ch = w[i]
        if w[i:i + 2] == "EV":
            rep, step = "AF", 2
        elif ch in _VOWELS:
            rep, step = "A", 1
        elif ch == "Q":
            rep, step = "G", 1
        elif ch == "Z":
            rep, step = "S", 1
        elif ch == "M":
            rep, step = "N", 1
        elif w[i:i + 2] == "KN":
            rep, step = "N", 2
        elif ch == "K":
            rep, step = "C", 1
        elif w[i:i + 3] == "SCH":
            rep, step = "SSS", 3
        elif w[i:i + 2] == "PH":
            rep, step = "FF", 2
        elif ch == "H" and (w[i - 1] not in _VOWELS
                            or (i + 1 < n and w[i + 1] not in _VOWELS)):
            rep, step = w[i - 1], 1
        elif ch == "W" and w[i - 1] in _VOWELS:
            rep, step = w[i - 1], 1
        else:
            rep, step = ch, 1
        for r in rep:
            if r != key[-1]:
                key.append(r)
        i += step
    # terminal cleanup
    if key[-1] == "S" and len(key) > 1:
        key.pop()
    if key[-2:] == ["A", "Y"]:
        key[-2:] = ["Y"]
    if key[-1] == "A" and len(key) > 1:
        key.pop()
    return "".join(key)


# --------------------------------------------------------- caverphone2 --

_CV2_STEPS: list[tuple[str, str]] = [
    # (regex, replacement) in spec order, applied to the lowercase word
    (r"e$", ""),
    (r"^cough", "cou2f"),
    (r"^rough", "rou2f"),
    (r"^tough", "tou2f"),
    (r"^enough", "enou2f"),
    (r"^trough", "trou2f"),
    (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"),
    (r"ci", "si"),
    (r"ce", "se"),
    (r"cy", "sy"),
    (r"tch", "2ch"),
    (r"c", "k"),
    (r"q", "k"),
    (r"x", "k"),
    (r"v", "f"),
    (r"dg", "2g"),
    (r"tio", "sio"),
    (r"tia", "sia"),
    (r"d", "t"),
    (r"ph", "fh"),
    (r"b", "p"),
    (r"sh", "s2"),
    (r"z", "s"),
    (r"^[aeiou]", "A"),
    (r"[aeiou]", "3"),
    (r"j", "y"),
    (r"^y3", "Y3"),
    (r"^y", "A"),
    (r"y", "3"),
    (r"3gh3", "3kh3"),
    (r"gh", "22"),
    (r"g", "k"),
    (r"s+", "S"),
    (r"t+", "T"),
    (r"p+", "P"),
    (r"k+", "K"),
    (r"f+", "F"),
    (r"m+", "M"),
    (r"n+", "N"),
    (r"w3", "W3"),
    (r"wh3", "Wh3"),
    (r"w$", "3"),
    (r"w", "2"),
    (r"^h", "A"),
    (r"h", "2"),
    (r"r3", "R3"),
    (r"r$", "3"),
    (r"r", "2"),
    (r"l3", "L3"),
    (r"l$", "3"),
    (r"l", "2"),
    (r"2", ""),
    (r"3$", "A"),
    (r"3", ""),
]
_CV2_COMPILED = [(re.compile(p), r) for p, r in _CV2_STEPS]


def caverphone2(word: str) -> str:
    """Caverphone 2.0 (Caversham project spec): 10-char code padded
    with '1'."""
    w = re.sub(r"[^a-z]", "", word.lower())
    if not w:
        return ""
    for pat, rep in _CV2_COMPILED:
        w = pat.sub(rep, w)
    return (w + "1" * 10)[:10]


# ------------------------------------------------------------- filter --

ENCODERS: dict[str, Callable[[str], str]] = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "metaphone": metaphone,
    "nysiis": nysiis,
    "caverphone2": caverphone2,
}


def make_phonetic_filter(encoder: str | Callable[[str], str] = "metaphone",
                         inject: bool = True):
    """PhoneticFilter (``lucene/analysis/phonetic/.../PhoneticFilter.java:
    36``): emit each token's phonetic code; ``inject=True`` keeps the
    original token too, at the same position (posIncrement 0 in the
    reference)."""
    enc = ENCODERS[encoder] if isinstance(encoder, str) else encoder

    def phonetic_filter(tokens: TokenStream) -> TokenStream:
        out: TokenStream = []
        for t, p in tokens:
            code = enc(t)
            if inject:
                out.append((t, p))
                if code and code != t:
                    out.append((code, p))
            else:
                out.append((code if code else t, p))
        return out

    return phonetic_filter
