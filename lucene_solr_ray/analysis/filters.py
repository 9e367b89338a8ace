"""Token-filter zoo + custom analyzer chains (SURVEY.md §2.3 filter table).

A filter is a pure function ``list[(term, position)] -> list[(term,
position)]``; chains compose them after the tokenizer (the
TokenFilterFactory / CustomAnalyzer surface,
``lucene/analysis/common/.../util/TokenFilterFactory.java``,
``custom/CustomAnalyzer.java``). Implemented filters mirror the common
reference filters by behavior:

- lowercase        — LowerCaseFilter (per-codepoint simple mapping)
- stop             — StopFilter with position holes
- ascii_folding    — ASCIIFoldingFilter (NFKD + combining-mark strip +
                     special mappings)
- porter_stem      — PorterStemFilter (Porter 1980 algorithm, from the
                     published description)
- length           — LengthFilter
- ngram / edge_ngram — NGramTokenFilter / EdgeNGramTokenFilter (grams
                     share the source token's position)
- shingle          — ShingleFilter (word n-grams joined with a space,
                     unigrams optionally kept)
- synonym          — SynonymFilter (dictionary injection at the same
                     position)
"""

from __future__ import annotations

import unicodedata
from collections.abc import Callable

from .analyzer import ENGLISH_STOP_WORDS, java_lowercase
from .tokenizer import DEFAULT_MAX_TOKEN_LENGTH, StandardTokenizer

TokenStream = list[tuple[str, int]]
Filter = Callable[[TokenStream], TokenStream]


# ---------------------------------------------------------------- basic --

def lowercase_filter(tokens: TokenStream) -> TokenStream:
    return [(java_lowercase(t), p) for t, p in tokens]


def make_stop_filter(stopwords=ENGLISH_STOP_WORDS) -> Filter:
    stop = frozenset(stopwords)

    def stop_filter(tokens: TokenStream) -> TokenStream:
        return [(t, p) for t, p in tokens if t not in stop]

    return stop_filter


def make_length_filter(min_len: int = 1, max_len: int = 255) -> Filter:
    def length_filter(tokens: TokenStream) -> TokenStream:
        return [(t, p) for t, p in tokens if min_len <= len(t) <= max_len]

    return length_filter


_FOLD_SPECIAL = {"ß": "ss", "æ": "ae", "œ": "oe", "ð": "d", "þ": "th",
                 "ø": "o", "đ": "d", "ł": "l", "ƒ": "f",
                 "Æ": "AE", "Œ": "OE", "Ð": "D", "Þ": "TH",
                 "Ø": "O", "Đ": "D", "Ł": "L"}


def ascii_folding_filter(tokens: TokenStream) -> TokenStream:
    out = []
    for t, p in tokens:
        if t.isascii():
            out.append((t, p))
            continue
        folded = []
        for ch in t:
            if ch in _FOLD_SPECIAL:
                folded.append(_FOLD_SPECIAL[ch])
                continue
            decomp = unicodedata.normalize("NFKD", ch)
            kept = "".join(c for c in decomp
                           if unicodedata.category(c) != "Mn")
            folded.append(kept if kept.isascii() else ch)
        out.append(("".join(folded), p))
    return out


# --------------------------------------------------------------- porter --

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (_is_cons(word, len(word) - 3)
            and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)
            and word[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Porter (1980) stemming algorithm, steps 1a-5b, with Lucene
    PorterStemmer's length guard (strings of length <= 2 pass through —
    PorterStemmer.java stem(): ``k <= k0+1``). The Snowball-generated
    porter variant has NO guard and stems 'as' -> 'a'; that variant is
    ``snowball_porter_stem`` below, golden-validated against the
    reference's porter vocabulary."""
    if len(word) <= 2:
        return word
    return _porter_body(word)


def snowball_porter_stem(word: str) -> str:
    """org.tartarus.snowball.ext.PorterStemmer semantics (no length
    guard) — full-vocabulary golden-validated."""
    return _porter_body(word)


def _porter_body(word: str) -> str:
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
                     ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
                     ("alli", "al"), ("entli", "ent"), ("eli", "e"),
                     ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
                     ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def porter_stem_filter(tokens: TokenStream) -> TokenStream:
    return [(porter_stem(t), p) for t, p in tokens]


# ---------------------------------------------------------------- grams --

def make_ngram_filter(min_gram: int = 2, max_gram: int = 3) -> Filter:
    def ngram_filter(tokens: TokenStream) -> TokenStream:
        out = []
        for t, p in tokens:
            for n in range(min_gram, max_gram + 1):
                for i in range(0, len(t) - n + 1):
                    out.append((t[i:i + n], p))
        return out

    return ngram_filter


def make_edge_ngram_filter(min_gram: int = 1, max_gram: int = 5) -> Filter:
    def edge_ngram_filter(tokens: TokenStream) -> TokenStream:
        out = []
        for t, p in tokens:
            for n in range(min_gram, min(max_gram, len(t)) + 1):
                out.append((t[:n], p))
        return out

    return edge_ngram_filter


def make_shingle_filter(size: int = 2, output_unigrams: bool = True) -> Filter:
    def shingle_filter(tokens: TokenStream) -> TokenStream:
        out = list(tokens) if output_unigrams else []
        for i in range(len(tokens) - size + 1):
            window = tokens[i:i + size]
            out.append((" ".join(t for t, _ in window), window[0][1]))
        return sorted(out, key=lambda tp: tp[1])

    return shingle_filter


def make_synonym_filter(mapping: dict[str, list[str]]) -> Filter:
    def synonym_filter(tokens: TokenStream) -> TokenStream:
        out = []
        for t, p in tokens:
            out.append((t, p))
            for syn in mapping.get(t, ()):
                out.append((syn, p))  # injected at the same position
        return out

    return synonym_filter


# ---------------------------------------------------------------- chain --

def trim_filter(tokens: TokenStream) -> TokenStream:
    """TrimFilter (analysis/miscellaneous/TrimFilter.java): strip
    leading/trailing whitespace; empty results are dropped (keeps the
    position hole like the reference with a following filter)."""
    return [(t.strip(), p) for t, p in tokens if t.strip()]


def reverse_string_filter(tokens: TokenStream) -> TokenStream:
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java)."""
    return [(t[::-1], p) for t, p in tokens]


def make_truncate_filter(length: int = 10) -> Filter:
    """TruncateTokenFilter (analysis/miscellaneous/TruncateTokenFilter.java)."""

    def truncate(tokens: TokenStream) -> TokenStream:
        return [(t[:length], p) for t, p in tokens]

    return truncate


def make_limit_token_count_filter(max_tokens: int = 100) -> Filter:
    """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java):
    keep only the first N tokens of the stream."""

    def limit(tokens: TokenStream) -> TokenStream:
        return tokens[:max_tokens]

    return limit


def make_pattern_replace_filter(pattern: str, replacement: str) -> Filter:
    """PatternReplaceFilter (analysis/pattern/PatternReplaceFilter.java):
    regex substitution per token; tokens that become empty are dropped."""
    import re as _re

    rx = _re.compile(pattern)

    def pattern_replace(tokens: TokenStream) -> TokenStream:
        out = []
        for t, p in tokens:
            t2 = rx.sub(replacement, t)
            if t2:
                out.append((t2, p))
        return out

    return pattern_replace


def make_keyword_marker_stem_filter(keywords: set[str]) -> Filter:
    """KeywordMarkerFilter + PorterStemFilter composition
    (miscellaneous/SetKeywordMarkerFilter.java): marked keywords bypass
    the stemmer."""
    kw = frozenset(keywords)

    def stem_unless_keyword(tokens: TokenStream) -> TokenStream:
        return [(t if t in kw else porter_stem(t), p) for t, p in tokens]

    return stem_unless_keyword


class CustomAnalyzer:
    """Tokenizer + filter chain with the same ``analyze`` protocol the
    index build consumes (CustomAnalyzer.java builder analog)."""

    def __init__(self, filters: list[Filter],
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.tokenizer = StandardTokenizer(max_token_length)
        self.filters = filters

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        tokens: TokenStream = [
            (t, p) for p, t in enumerate(self.tokenizer.tokenize(text))]
        for f in self.filters:
            tokens = f(tokens)
        return [t for t, _ in tokens], [p for _, p in tokens]

    def analyze_terms(self, text: str) -> list[str]:
        return self.analyze(text)[0]


def _phonetic_chain(encoder: str) -> CustomAnalyzer:
    from .phonetic import make_phonetic_filter

    # inject=True: original + code at the same position, so exact matches
    # still outrank phonetic ones (PhoneticFilter's default)
    return CustomAnalyzer(
        [lowercase_filter, make_phonetic_filter(encoder, inject=True)])


#: named chains available to build_index(analyzer=...) via the registry
CUSTOM_CHAINS: dict[str, CustomAnalyzer] = {
    "english_stemmed": CustomAnalyzer(
        [lowercase_filter, make_stop_filter(), porter_stem_filter]),
    "folded": CustomAnalyzer([lowercase_filter, ascii_folding_filter]),
    "edge_autocomplete": CustomAnalyzer(
        [lowercase_filter, make_edge_ngram_filter(2, 8)]),
    "shingled": CustomAnalyzer(
        [lowercase_filter, make_stop_filter(), make_shingle_filter(2)]),
    "phonetic_metaphone": _phonetic_chain("metaphone"),
    "phonetic_soundex": _phonetic_chain("soundex"),
    "phonetic_nysiis": _phonetic_chain("nysiis"),
    "phonetic_caverphone": _phonetic_chain("caverphone2"),
}


# ---------------------------------------------------------------- more --

def decimal_digit_filter(tokens: TokenStream) -> TokenStream:
    """DecimalDigitFilter (``lucene/analysis/common/.../core/
    DecimalDigitFilter.java``): fold any Unicode decimal digit to its
    ASCII 0-9 equivalent."""
    def fold(t: str) -> str:
        if all("0" <= c <= "9" or not c.isdigit() for c in t):
            return t
        return "".join(str(unicodedata.digit(c)) if c.isdigit() else c
                       for c in t)

    return [(fold(t), p) for t, p in tokens]


def apostrophe_filter(tokens: TokenStream) -> TokenStream:
    """ApostropheFilter (``lucene/analysis/common/.../tr/
    ApostropheFilter.java``): strip the apostrophe and everything after
    it (the Turkish-analysis convention)."""
    def strip(t: str) -> str:
        for ch in ("'", "’"):
            i = t.find(ch)
            if i >= 0:
                return t[:i]
        return t

    return [(strip(t), p) for t, p in tokens if strip(t)]


def make_keep_word_filter(keep: set[str]) -> Filter:
    """KeepWordFilter (``lucene/analysis/common/.../miscellaneous/
    KeepWordFilter.java``): drop every token NOT in the keep set
    (positions preserved — holes like StopFilter)."""
    keep_f = frozenset(keep)

    def keep_word_filter(tokens: TokenStream) -> TokenStream:
        return [(t, p) for t, p in tokens if t in keep_f]

    return keep_word_filter


def make_stemmer_override_filter(overrides: dict[str, str],
                                 stem: Callable[[str], str] = None) -> Filter:
    """StemmerOverrideFilter (``lucene/analysis/common/.../miscellaneous/
    StemmerOverrideFilter.java``): dictionary-pinned stems win over the
    algorithmic stemmer (Porter by default)."""
    stem = stem or porter_stem

    def stemmer_override_filter(tokens: TokenStream) -> TokenStream:
        return [(overrides.get(t) or stem(t), p) for t, p in tokens]

    return stemmer_override_filter


def icu_normalize_filter(tokens: TokenStream) -> TokenStream:
    """ICUNormalizer2Filter analog (``lucene/analysis/icu/.../
    ICUNormalizer2Filter.java:30``): the reference's default is NFKC +
    case folding (nfkc_cf). Python's unicodedata provides NFKC; simple
    casefold() approximates UTS#46 case folding (no ICU in this
    container — behavior divergence is limited to the small set of
    full-casefold expansions ICU adds on top)."""
    out = []
    for t, p in tokens:
        n = unicodedata.normalize("NFKC", t).casefold()
        if n:
            out.append((n, p))
    return out


def make_common_grams_filter(common: frozenset[str] | set[str] | None = None
                             ) -> Filter:
    """CommonGramsFilter (``lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java:43``): for each adjacent pair where either
    word is a common word, ALSO emit the bigram ``a_b`` at the first
    word's position — keeping unigrams, so stopword-adjacent phrases
    ("the who") stay searchable as one precise token without dropping
    recall."""
    words = frozenset(common if common is not None else ENGLISH_STOP_WORDS)

    def common_grams_filter(tokens: TokenStream) -> TokenStream:
        out: TokenStream = []
        for i, (t, p) in enumerate(tokens):
            out.append((t, p))
            if i + 1 < len(tokens):
                nt, np_ = tokens[i + 1]
                # only adjacent positions pair up (no gram across a hole)
                if np_ == p + 1 and (t in words or nt in words):
                    out.append((f"{t}_{nt}", p))
        return out

    return common_grams_filter


CUSTOM_CHAINS["icu_folded"] = CustomAnalyzer([icu_normalize_filter])
CUSTOM_CHAINS["common_grams"] = CustomAnalyzer(
    [lowercase_filter, make_common_grams_filter()])


# --- Snowball stemmers (org/tartarus/snowball/ext/*Stemmer.java) --------

def make_snowball_filter(lang: str) -> Filter:
    """Token filter over one of the pure-Python Snowball stemmers
    (analysis/snowball.py; golden-validated word-for-word against the
    reference's TestSnowballVocab vocabularies)."""
    from .snowball import SNOWBALL_STEMS

    stem = SNOWBALL_STEMS[lang]

    def snowball_filter(tokens: TokenStream) -> TokenStream:
        return [(stem(t), p) for t, p in tokens]

    snowball_filter.__name__ = f"snowball_{lang}_filter"
    return snowball_filter


for _lang in ("german", "german2", "french", "spanish", "italian",
              "portuguese", "russian", "danish", "norwegian", "swedish",
              "dutch", "finnish", "romanian", "hungarian"):
    CUSTOM_CHAINS[f"{_lang}_stemmed"] = CustomAnalyzer(
        [lowercase_filter, make_snowball_filter(_lang)])
# 'english_stemmed' (stop + Porter 1980) predates the snowball registry;
# the Porter2 chain gets its own name
CUSTOM_CHAINS["english_snowball_stemmed"] = CustomAnalyzer(
    [lowercase_filter, make_stop_filter(), make_snowball_filter("english")])
