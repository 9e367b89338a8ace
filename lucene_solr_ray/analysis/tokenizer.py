"""StandardTokenizer: UAX#29 word-break segmentation, Lucene semantics.

This is a from-scratch Python translation of the *grammar* (not the code) of
the reference tokenizer — the JFlex word-break rules in
``lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.jflex`` — onto the ``regex`` module's Unicode
Word_Break / Script / Line_Break property classes.

Semantics reproduced:

- Token types: ``<ALPHANUM>`` ``<NUM>`` ``<SOUTHEAST_ASIAN>`` ``<IDEOGRAPHIC>``
  ``<HIRAGANA>`` ``<KATAKANA>`` ``<HANGUL>`` (StandardTokenizer.java:62-80).
- JFlex longest-match with rule-order tie-break: the NUMERIC rule (rule 1)
  wins over the WORD rule on equal-length matches, HANGUL/KATAKANA likewise.
  Implemented by matching the WORD superset first, then reclassifying via
  fullmatch against the narrower rules.
- Regional indicators and all other characters are dropped (final ``[^]``
  rule ignores them).
- ``maxTokenLength`` (default 255, StandardAnalyzer.java:39): the scanner
  buffer equals maxTokenLength with growth disabled (jflex ``%buffer 255`` +
  LUCENE-5897), so a longer run is emitted as consecutive chunks of at most
  maxTokenLength characters rather than skipped.

An ASCII fast path compiles an equivalent ``re`` pattern whose character
classes are *derived from* the Unicode property classes at import time, so
the two paths cannot disagree; a hypothesis test asserts equivalence.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

import regex

# --- token types (StandardTokenizer.java:62-80) ---
ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
SOUTHEAST_ASIAN = "<SOUTHEAST_ASIAN>"
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"

DEFAULT_MAX_TOKEN_LENGTH = 255

# --- UAX#29 macro classes (StandardTokenizerImpl.jflex:50-65) ---
_EF = r"[\p{WB=Format}\p{WB=Extend}]*"
_HANGUL_C = r"[\p{Script=Hangul}&&[\p{WB=ALetter}\p{WB=Hebrew_Letter}]]"
_HEB_ALETTER_C = r"[\p{WB=Hebrew_Letter}\p{WB=ALetter}]"
_NUMERIC_C = r"[\p{WB=Numeric}[\p{Block=Halfwidth_and_Fullwidth_Forms}&&\p{Nd}]]"
_KATAKANA_C = r"\p{WB=Katakana}"
_MIDLETTER_C = r"[\p{WB=MidLetter}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_MIDNUM_C = r"[\p{WB=MidNum}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_ENL_C = r"\p{WB=ExtendNumLet}"
_HAN_C = r"\p{Script=Han}"
_HIRAGANA_CLS = r"\p{Script=Hiragana}"
_SQ_C = r"\p{WB=Single_Quote}"
_DQ_C = r"\p{WB=Double_Quote}"
_HEB_C = r"\p{WB=Hebrew_Letter}"
_SEA_C = r"\p{LineBreak=Complex_Context}"


def _grammar(ef: str, hangul: str, heb_or_aletter: str, numeric: str, katakana: str,
             midletter: str, midnum: str, enl: str, heb: str, sq: str, dq: str):
    """Build the rule patterns from character-class strings.

    Mirrors the jflex productions; each *Ex class is ``class EF``.
    """
    HangulEx = hangul + ef
    HebOrALetterEx = heb_or_aletter + ef
    NumericEx = numeric + ef
    KatakanaEx = katakana + ef
    MidLetterEx = midletter + ef
    MidNumericEx = midnum + ef
    ENLEx = enl + ef
    SQEx = sq + ef
    DQEx = dq + ef
    HebrewEx = heb + ef

    # {ExtendNumLetEx}* {NumericEx} ( ( {ExtendNumLetEx}* | {MidNumericEx} ) {NumericEx} )* {ExtendNumLetEx}*
    numeric_rule = (
        f"(?:{ENLEx})*{NumericEx}"
        f"(?:(?:(?:{ENLEx})*|{MidNumericEx}){NumericEx})*"
        f"(?:{ENLEx})*"
    )
    hangul_rule = f"(?:{HangulEx})+"
    katakana_rule = f"(?:{KatakanaEx})+"

    kat_chain = f"{KatakanaEx}(?:(?:{ENLEx})*{KatakanaEx})*"
    inner = (
        f"(?:{HebrewEx}(?:{SQEx}|{DQEx}{HebrewEx})"
        f"|{NumericEx}(?:(?:(?:{ENLEx})*|{MidNumericEx}){NumericEx})*"
        f"|{HebOrALetterEx}(?:(?:(?:{ENLEx})*|{MidLetterEx}){HebOrALetterEx})*"
        f")+"
    )
    word_rule = (
        f"(?:{ENLEx})*"
        f"(?:{kat_chain}|{inner})"
        f"(?:(?:{ENLEx})+(?:{kat_chain}|{inner}))*"
        f"(?:{ENLEx})*"
    )
    return word_rule, numeric_rule, hangul_rule, katakana_rule


_WORD_RULE, _NUMERIC_RULE, _HANGUL_RULE, _KATAKANA_RULE = _grammar(
    _EF, _HANGUL_C, _HEB_ALETTER_C, _NUMERIC_C, _KATAKANA_C,
    _MIDLETTER_C, _MIDNUM_C, _ENL_C, _HEB_C, _SQ_C, _DQ_C,
)

_FLAGS = regex.V1
# Combined scanner: WORD is a superset of NUMERIC/HANGUL/KATAKANA (same
# maximal match length on those inputs), so it goes first; SE Asian, Han and
# Hiragana classes are disjoint from it. finditer skips ignored chars.
_SCANNER = regex.compile(
    f"(?P<WORD>{_WORD_RULE})"
    f"|(?P<SEA>(?:{_SEA_C}{_EF})+)"
    f"|(?P<HAN>{_HAN_C}{_EF})"
    f"|(?P<HIRA>{_HIRAGANA_CLS}{_EF})",
    _FLAGS,
)
_NUMERIC_FULL = regex.compile(_NUMERIC_RULE, _FLAGS)
_HANGUL_FULL = regex.compile(_HANGUL_RULE, _FLAGS)
_KATAKANA_FULL = regex.compile(_KATAKANA_RULE, _FLAGS)


# --- ASCII fast path: derive ASCII members of each class, build `re` pattern ---
@lru_cache(maxsize=1)
def _ascii_classes() -> dict[str, str]:
    members: dict[str, str] = {}
    for name, cls in [
        ("aletter", _HEB_ALETTER_C), ("numeric", _NUMERIC_C),
        ("midletter", _MIDLETTER_C), ("midnum", _MIDNUM_C), ("enl", _ENL_C),
    ]:
        pat = regex.compile(cls, _FLAGS)
        chars = "".join(chr(c) for c in range(128) if pat.fullmatch(chr(c)))
        members[name] = re.escape(chars)
    return members


@lru_cache(maxsize=1)
def _ascii_scanner():
    c = _ascii_classes()
    AL, NU, ML, MN, XX = (f"[{c['aletter']}]", f"[{c['numeric']}]",
                          f"[{c['midletter']}]", f"[{c['midnum']}]", f"[{c['enl']}]")
    num_chain = f"{NU}(?:(?:{XX}*|{MN}){NU})*"
    let_chain = f"{AL}(?:(?:{XX}*|{ML}){AL})*"
    inner = f"(?:{num_chain}|{let_chain})+"
    word = f"{XX}*{inner}(?:{XX}+{inner})*{XX}*"
    numeric_full = f"{XX}*{num_chain}{XX}*"
    return re.compile(word), re.compile(numeric_full)


@dataclass
class Token:
    __slots__ = ("text", "start", "end", "type")
    text: str
    start: int
    end: int
    type: str


class StandardTokenizer:
    """UAX#29 tokenizer; ``tokenize`` yields surface chunks, ``tokenize_full``
    yields Tokens with offsets and Lucene token types."""

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.max_token_length = max_token_length

    def _chunks(self, text: str, spans: bool):
        """Yield (text, start, end, type) applying the maxTokenLength
        policy. At the DEFAULT limit (255 == the jflex scanner buffer,
        LUCENE-5897) over-long runs are chunked — the buffer makes that
        the reference's actual behavior. For a NON-default limit the
        reference SKIPS the over-long token and accumulates a position
        hole (StandardTokenizer.java:165-166 skippedPositions); a skipped
        token is yielded as ``(None, s, e, typ)`` so callers can keep the
        hole."""
        mtl = self.max_token_length
        skip_long = mtl < DEFAULT_MAX_TOKEN_LENGTH
        if text.isascii():
            word_re, num_re = _ascii_scanner()
            for m in word_re.finditer(text):
                s, e = m.span()
                tok = m.group()
                typ = NUM if num_re.fullmatch(tok) else ALPHANUM
                if e - s <= mtl:
                    yield tok, s, e, typ
                elif skip_long:
                    yield None, s, e, typ
                else:
                    for off in range(s, e, mtl):
                        yield text[off:min(off + mtl, e)], off, min(off + mtl, e), typ
            return
        for m in _SCANNER.finditer(text):
            s, e = m.span()
            tok = m.group()
            kind = m.lastgroup
            if kind == "WORD":
                if _NUMERIC_FULL.fullmatch(tok):
                    typ = NUM
                elif _HANGUL_FULL.fullmatch(tok):
                    typ = HANGUL
                elif _KATAKANA_FULL.fullmatch(tok):
                    typ = KATAKANA
                else:
                    typ = ALPHANUM
            elif kind == "SEA":
                typ = SOUTHEAST_ASIAN
            elif kind == "HAN":
                typ = IDEOGRAPHIC
            else:
                typ = HIRAGANA
            if e - s <= mtl:
                yield tok, s, e, typ
            elif skip_long:
                yield None, s, e, typ
            else:
                for off in range(s, e, mtl):
                    yield text[off:min(off + mtl, e)], off, min(off + mtl, e), typ

    def tokenize(self, text: str) -> list[str]:
        return [t for t, _, _, _ in self._chunks(text, False)
                if t is not None]

    def tokenize_full(self, text: str) -> list[Token]:
        return [Token(t, s, e, ty) for t, s, e, ty in self._chunks(text, True)
                if t is not None]


# --- URL/email-aware variant ------------------------------------------

URL = "<URL>"
EMAIL = "<EMAIL>"

#: practical approximations of the jflex grammar's RFC coverage
#: (UAX29URLEmailTokenizer.jflex): scheme:// and www. URLs, RFC-5321-ish
#: local@domain emails. Trailing sentence punctuation is excluded.
_EMAIL_RE = (r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@"
             r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
             r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)+")
_URL_RE = (r"(?:(?:https?|ftp)://|www\.)"
           r"[^\s<>\"'`]+[^\s<>\"'`.,;:!?)\]}]")
_URL_EMAIL = re.compile(
    f"(?P<EMAIL>{_EMAIL_RE})|(?P<URL>{_URL_RE})", re.IGNORECASE)


class UAX29URLEmailTokenizer(StandardTokenizer):
    """Email/URL-aware UAX#29 tokenizer
    (``lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/
    UAX29URLEmailTokenizer.java``): e-mail addresses and URLs come through
    as single tokens typed <EMAIL>/<URL>; the text between them tokenizes
    exactly like StandardTokenizer. The jflex grammar's full RFC coverage
    is approximated (scheme:// and www. URLs; common emails) — documented
    divergence for exotic address forms."""

    def _chunks(self, text: str, spans: bool):
        pos = 0
        for m in _URL_EMAIL.finditer(text):
            s, e = m.span()
            for tok, ts, te, ty in super()._chunks(text[pos:s], spans):
                yield tok, ts + pos, te + pos, ty
            tok = m.group()
            if len(tok) <= self.max_token_length:
                yield tok, s, e, EMAIL if m.lastgroup == "EMAIL" else URL
            elif self.max_token_length < DEFAULT_MAX_TOKEN_LENGTH:
                yield None, s, e, EMAIL if m.lastgroup == "EMAIL" else URL
            else:
                for off in range(s, e, self.max_token_length):
                    stop_at = min(off + self.max_token_length, e)
                    yield (text[off:stop_at], off, stop_at,
                           EMAIL if m.lastgroup == "EMAIL" else URL)
            pos = e
        for tok, ts, te, ty in super()._chunks(text[pos:], spans):
            yield tok, ts + pos, te + pos, ty
