"""WordBreakSpellChecker analog.

Re-expression of ``lucene/suggest/src/java/org/apache/lucene/search/
spell/WordBreakSpellChecker.java``: suggest places to BREAK a run-on
word into index terms (:255-306 generateBreakUpSuggestions — recursive
left-prefix splitting, both sides must clear minSuggestionFrequency,
up to maxChanges breaks, bounded by maxEvaluations) and to COMBINE
adjacent query words into one index term (:161-240
suggestWordCombinations — windows of up to maxChanges+1 words, capped
at maxCombineWordLength, combined docFreq must clear the minimum).
Ranking follows NUM_CHANGES_THEN_MAX_FREQUENCY (:106-117): fewer
changes first, then higher frequency.

Term frequencies resolve through the searcher's global df (summed over
shards), memoized per call — each split probes at most two terms.
"""

from __future__ import annotations

from .query import TermQuery


def _df_fn(searcher):
    cache: dict[str, int] = {}

    def df(t: str) -> int:
        if t not in cache:
            cache[t] = searcher.global_df(TermQuery(t)).get(t, 0)
        return cache[t]

    return df


def suggest_word_breaks(searcher, term: str, max_suggestions: int = 5,
                        max_changes: int = 1, min_break_length: int = 1,
                        min_freq: int = 1,
                        max_evaluations: int = 1000) -> list[dict]:
    """Break suggestions for one run-on word: each result is
    ``{"words": [...], "freqs": [...], "changes": n}``, ranked fewer
    changes first then max frequency descending."""
    df = _df_fn(searcher)
    out: list[tuple[int, int, tuple[str, ...], tuple[int, ...]]] = []
    evals = [0]

    def recurse(text: str, breaks: int, prefix_w: tuple, prefix_f: tuple):
        n = len(text)
        if n < min_break_length * 2:
            return
        for i in range(min_break_length, n - min_break_length + 1):
            if evals[0] >= max_evaluations:
                return
            evals[0] += 1
            left, right = text[:i], text[i:]
            lf = df(left)
            if lf < min_freq:
                continue
            rf = df(right)
            if rf >= min_freq:
                words = prefix_w + (left, right)
                freqs = prefix_f + (lf, rf)
                out.append((len(words) - 1, max(freqs), words, freqs))
            if breaks + 1 <= max_changes:
                recurse(right, breaks + 1, prefix_w + (left,),
                        prefix_f + (lf,))

    recurse(term, 1, (), ())
    out.sort(key=lambda s: (s[0], -s[1], s[2]))
    return [{"words": list(w), "freqs": list(f), "changes": c}
            for c, _, w, f in out[:max_suggestions]]


def suggest_word_combinations(searcher, terms: list[str],
                              max_suggestions: int = 5,
                              max_changes: int = 1,
                              max_combine_length: int = 20,
                              min_freq: int = 1) -> list[dict]:
    """Combine suggestions: adjacent windows of 2..max_changes+1 words
    whose concatenation is an index term; each result is
    ``{"word", "freq", "indexes"}``, ranked fewer combined words first
    then frequency descending."""
    df = _df_fn(searcher)
    out: list[tuple[int, int, str, list[int]]] = []
    for i in range(len(terms)):
        if len(terms[i]) > max_combine_length:
            continue
        combined = terms[i]
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            combined = combined + terms[j]
            if len(combined) > max_combine_length:
                break
            f = df(combined)
            if f >= min_freq:
                out.append((j - i, f, combined, list(range(i, j + 1))))
    out.sort(key=lambda s: (s[0], -s[1], s[2]))
    return [{"word": w, "freq": f, "indexes": idx}
            for _, f, w, idx in out[:max_suggestions]]
